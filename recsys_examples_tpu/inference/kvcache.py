"""User-ID-keyed paged KV cache for HSTU inference.

Counterpart of corelib/recsys_kvcache_manager (facade
recsys_kvcache_manager/kvcache_manager.py:27-117: lookup_kvcache /
allocate_kvcache / onboard / offload / evict keyed by user ID, no prefix
matching; GPU paged table gpu_kvcache_manager.py:25 `DeviceKVCache` with
LRU eviction of oldest users).

TPU design: one functional state pytree —
  - kv pages: k/v [L, P, page_size, H, dh] in HBM
  - user directory: user id -> (page list, cached length, LRU stamp),
    fixed-capacity arrays; eviction = vectorized LRU prefix eviction.
All ops are state-in/state-out and jit under static shapes. Host-tier
offload (HostKVStorage) keeps evicted users' KV in host RAM as numpy and
re-onboards via device_put (the reference's pinned-host async onboarding;
XLA overlaps the H2D with compute when dispatched early).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@dataclasses.dataclass(frozen=True)
class KVCacheConfig:
    """(reference: recsys_kvcache_manager/kvcache_config.py:23)"""
    num_layers: int
    num_heads: int
    head_dim: int
    page_size: int = 128
    num_pages: int = 1024           # device pages (shared pool)
    max_users: int = 256            # device user-directory slots
    max_pages_per_user: int = 32
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def max_cached_len(self) -> int:
        return self.page_size * self.max_pages_per_user


@struct.dataclass
class KVCacheState:
    k_pages: jax.Array     # [L, P, page, H, dh]
    v_pages: jax.Array
    user_ids: jax.Array    # [U] int64 (-1 empty)
    user_len: jax.Array    # [U] int32 cached tokens
    user_pages: jax.Array  # [U, maxp] int32 page ids (-1 unset)
    user_lru: jax.Array    # [U] int64 last-use stamp
    page_owner: jax.Array  # [P] int32 user slot owning each page (-1 free)
    clock: jax.Array       # [1] int64


def create_kvcache(cfg: KVCacheConfig) -> KVCacheState:
    L, P, pg, H, dh = (
        cfg.num_layers, cfg.num_pages, cfg.page_size, cfg.num_heads,
        cfg.head_dim,
    )
    return KVCacheState(
        k_pages=jnp.zeros((L, P, pg, H, dh), cfg.dtype),
        v_pages=jnp.zeros((L, P, pg, H, dh), cfg.dtype),
        user_ids=jnp.full((cfg.max_users,), -1, jnp.int64),
        user_len=jnp.zeros((cfg.max_users,), jnp.int32),
        user_pages=jnp.full(
            (cfg.max_users, cfg.max_pages_per_user), -1, jnp.int32
        ),
        user_lru=jnp.zeros((cfg.max_users,), jnp.int64),
        page_owner=jnp.full((cfg.num_pages,), -1, jnp.int32),
        clock=jnp.zeros((1,), jnp.int64),
    )


def lookup_kvcache(
    state: KVCacheState, user_ids: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """[B] user ids -> (user slots or -1, cached lengths)
    (reference: kvcache_manager.py:52)."""
    eq = state.user_ids[None, :] == user_ids[:, None]
    found = jnp.any(eq, axis=1)
    slot = jnp.where(found, jnp.argmax(eq, axis=1).astype(jnp.int32), -1)
    cached = jnp.where(found, state.user_len[jnp.maximum(slot, 0)], 0)
    return slot, cached


def allocate_kvcache(
    state: KVCacheState,
    cfg: KVCacheConfig,
    user_ids: jax.Array,   # [B] int64 (-1 = inactive row)
    total_len: jax.Array,  # [B] int32 tokens the user will have cached
) -> Tuple[KVCacheState, jax.Array]:
    """Ensure each user has a directory slot + enough pages; LRU-evict
    other users if the pool is short (reference: kvcache_manager.py:59 +
    gpu_kvcache_manager.py page alloc/LRU evict).

    Returns (state, user_slots [B])."""
    B = user_ids.shape[0]
    U = cfg.max_users
    P = cfg.num_pages
    active = user_ids >= 0
    slot, cached = lookup_kvcache(state, user_ids)
    clock = state.clock + 1

    # --- assign directory slots for new users (evict LRU non-batch users)
    in_batch = jnp.zeros((U,), bool).at[jnp.maximum(slot, 0)].set(
        active & (slot >= 0)
    )
    # eviction priority: free slots first, then lowest LRU, never in-batch
    slot_free = state.user_ids < 0
    prio = jnp.where(
        in_batch, jnp.iinfo(jnp.int64).max,
        jnp.where(slot_free, jnp.int64(-1), state.user_lru),
    )
    order = jnp.argsort(prio)  # best victims first
    need_new = active & (slot < 0)
    new_rank = jnp.cumsum(need_new.astype(jnp.int32)) - 1
    new_slot = order[jnp.clip(new_rank, 0, U - 1)].astype(jnp.int32)
    slot = jnp.where(need_new, new_slot, slot)

    # release pages of evicted victims (their slot is being reused)
    victim = jnp.zeros((U,), bool).at[
        jnp.where(need_new, new_slot, U - 1)
    ].set(need_new, mode="drop")
    victim = victim & (state.user_ids >= 0)
    page_owner = jnp.where(
        victim[jnp.maximum(state.page_owner, 0)] & (state.page_owner >= 0),
        -1,
        state.page_owner,
    )
    user_ids_dir = jnp.where(victim, -1, state.user_ids)
    user_len_dir = jnp.where(victim, 0, state.user_len)
    user_pages_dir = jnp.where(victim[:, None], -1, state.user_pages)

    # register new users
    user_ids_dir = user_ids_dir.at[
        jnp.where(need_new, slot, U)
    ].set(user_ids, mode="drop")
    user_len_dir = user_len_dir.at[
        jnp.where(need_new, slot, U)
    ].set(0, mode="drop")
    lru = state.user_lru.at[jnp.where(active, slot, U)].set(
        clock[0], mode="drop"
    )

    # --- page allocation: pages needed per user beyond current
    have = (user_len_dir[jnp.maximum(slot, 0)] + cfg.page_size - 1) // cfg.page_size
    have = jnp.where(need_new, 0, have)
    want = (total_len + cfg.page_size - 1) // cfg.page_size
    want = jnp.minimum(want, cfg.max_pages_per_user)
    need_pages = jnp.where(active, jnp.maximum(want - have, 0), 0)  # [B]
    total_need = need_pages.sum()

    free = page_owner < 0
    num_free = free.sum()
    # LRU page eviction if short: evict whole users (lowest LRU, not in
    # batch) until enough pages are free — vectorized prefix eviction.
    in_batch2 = jnp.zeros((U,), bool).at[
        jnp.where(active, slot, U)
    ].set(True, mode="drop")
    upage_cnt = (user_pages_dir >= 0).sum(axis=1)
    evict_prio = jnp.where(
        in_batch2 | (user_ids_dir < 0), jnp.iinfo(jnp.int64).max, lru
    )
    eorder = jnp.argsort(evict_prio)
    freed_cum = jnp.cumsum(upage_cnt[eorder])
    shortfall = jnp.maximum(total_need - num_free, 0)
    evict_k = jnp.searchsorted(freed_cum, shortfall, side="left") + (
        shortfall > 0
    ).astype(jnp.int32)
    evict_mask_sorted = (
        jnp.arange(U) < evict_k
    ) & (evict_prio[eorder] < jnp.iinfo(jnp.int64).max)
    evict_user = jnp.zeros((U,), bool).at[eorder].set(evict_mask_sorted)
    page_owner = jnp.where(
        (page_owner >= 0) & evict_user[jnp.maximum(page_owner, 0)],
        -1, page_owner,
    )
    user_ids_dir = jnp.where(evict_user, -1, user_ids_dir)
    user_len_dir = jnp.where(evict_user, 0, user_len_dir)
    user_pages_dir = jnp.where(evict_user[:, None], -1, user_pages_dir)

    # hand out free pages: rank of each request among all needed pages
    free = page_owner < 0
    free_pages = jnp.argsort(~free)  # free page ids first
    start = jnp.cumsum(need_pages) - need_pages  # [B]
    # per-user new page list positions
    maxp = cfg.max_pages_per_user
    pg_idx = jnp.arange(maxp, dtype=jnp.int32)[None, :]
    is_new = (pg_idx >= have[:, None]) & (pg_idx < want[:, None]) & active[:, None]
    grant_rank = start[:, None] + (pg_idx - have[:, None])
    grant_rank = jnp.clip(grant_rank, 0, P - 1)
    granted = jnp.where(is_new, free_pages[grant_rank].astype(jnp.int32), -1)
    # write granted pages into directories
    su = jnp.where(active, slot, U)
    cur = user_pages_dir.at[su, :].get(mode="clip")
    newp = jnp.where(is_new, granted, cur)
    user_pages_dir = user_pages_dir.at[su, :].set(newp, mode="drop")
    page_owner = page_owner.at[
        jnp.where(is_new, granted, P).reshape(-1)
    ].set(jnp.repeat(slot, maxp), mode="drop")

    new_state = state.replace(
        user_ids=user_ids_dir,
        user_len=user_len_dir,
        user_pages=user_pages_dir,
        user_lru=lru,
        page_owner=page_owner,
        clock=clock,
    )
    return new_state, jnp.where(active, slot, -1)


def append_kvcache(
    state: KVCacheState,
    cfg: KVCacheConfig,
    slots: jax.Array,       # [B] user slots
    new_k: jax.Array,       # [L, B, S_new, H, dh]
    new_v: jax.Array,
    new_lens: jax.Array,    # [B] valid new tokens per user
) -> KVCacheState:
    """Write new tokens after each user's cached length
    (reference: paged-KV append, examples/commons/ops/cuda_ops/csrc/
    paged_kvcache_ops_cuda.cpp `append_kvcache`)."""
    L, B, S, H, dh = new_k.shape
    pg = cfg.page_size
    base = state.user_len[jnp.maximum(slots, 0)]
    tok = jnp.arange(S, dtype=jnp.int32)[None, :]
    gpos = base[:, None] + tok                         # [B, S] global pos
    page_idx = gpos // pg
    in_page = gpos % pg
    pages = state.user_pages[jnp.maximum(slots, 0)]    # [B, maxp]
    page_id = jnp.take_along_axis(
        pages, jnp.clip(page_idx, 0, cfg.max_pages_per_user - 1), axis=1
    )                                                   # [B, S]
    ok = (slots[:, None] >= 0) & (tok < new_lens[:, None]) & (page_id >= 0)
    tgt_page = jnp.where(ok, page_id, cfg.num_pages)   # OOB drop
    flatp = tgt_page.reshape(-1)
    flati = in_page.reshape(-1)
    k_pages = state.k_pages.at[:, flatp, flati].set(
        new_k.reshape(L, B * S, H, dh).astype(state.k_pages.dtype),
        mode="drop",
    )
    v_pages = state.v_pages.at[:, flatp, flati].set(
        new_v.reshape(L, B * S, H, dh).astype(state.v_pages.dtype),
        mode="drop",
    )
    new_len = jnp.where(
        slots >= 0,
        jnp.minimum(base + new_lens, cfg.max_cached_len),
        0,
    )
    user_len = state.user_len.at[
        jnp.where(slots >= 0, slots, cfg.max_users)
    ].set(new_len, mode="drop")
    return state.replace(k_pages=k_pages, v_pages=v_pages, user_len=user_len)


def gather_kvcache(
    state: KVCacheState,
    cfg: KVCacheConfig,
    slots: jax.Array,    # [B]
    max_len: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Read each user's cached KV into padded dense
    [L, B, max_len, H, dh] x2 + lengths [B]
    (reference: gather_kvcache paged_kvcache_ops_cuda.cpp:326)."""
    pg = cfg.page_size
    lens = jnp.where(slots >= 0, state.user_len[jnp.maximum(slots, 0)], 0)
    pos = jnp.arange(max_len, dtype=jnp.int32)[None, :]
    page_idx = jnp.clip(pos // pg, 0, cfg.max_pages_per_user - 1)
    in_page = pos % pg
    pages = state.user_pages[jnp.maximum(slots, 0)]
    page_id = jnp.take_along_axis(pages, page_idx, axis=1)  # [B, max_len]
    ok = (pos < lens[:, None]) & (page_id >= 0)
    pid = jnp.where(ok, page_id, 0).reshape(-1)
    B = slots.shape[0]
    ip = jnp.broadcast_to(in_page, (B, max_len)).reshape(-1)
    k = state.k_pages[:, pid, ip].reshape(
        cfg.num_layers, B, max_len, cfg.num_heads, cfg.head_dim
    )
    v = state.v_pages[:, pid, ip].reshape(
        cfg.num_layers, B, max_len, cfg.num_heads, cfg.head_dim
    )
    m = ok.reshape(1, B, max_len, 1, 1)
    return (
        jnp.where(m, k, jnp.zeros((), k.dtype)),
        jnp.where(m, v, jnp.zeros((), v.dtype)),
        lens,
    )


def evict_users(state: KVCacheState, user_ids: jax.Array) -> KVCacheState:
    """Explicit eviction (reference: kvcache_manager.py `evict`)."""
    slot, _ = lookup_kvcache(state, user_ids)
    U = state.user_ids.shape[0]
    victim = jnp.zeros((U,), bool).at[
        jnp.where(slot >= 0, slot, U)
    ].set(True, mode="drop")
    page_owner = jnp.where(
        (state.page_owner >= 0) & victim[jnp.maximum(state.page_owner, 0)],
        -1, state.page_owner,
    )
    return state.replace(
        user_ids=jnp.where(victim, -1, state.user_ids),
        user_len=jnp.where(victim, 0, state.user_len),
        user_pages=jnp.where(victim[:, None], -1, state.user_pages),
        page_owner=page_owner,
    )


class HostKVStorage:
    """Host-RAM tier for evicted users' KV, backed by the native C++ store
    (csrc/host_store.cpp) — counterpart of the reference's
    native_host_kvcache_manager.py:32 `NativeHostKVStorage` + its C++
    runtime. Python-side (outside jit): offload pulls a user's gathered KV
    to host; onboard device_puts it back and appends. Async overlap comes
    from dispatching the device_put before the compute that consumes it."""

    def __init__(self, cfg: KVCacheConfig, ram_capacity_users: int = 0,
                 ssd_dir: Optional[str] = None):
        from recsys_examples_tpu.utils.native import NativeHostStore

        self.cfg = cfg
        # Rows are bucketed by cached length (power-of-two token widths):
        # a user with n cached tokens lives in the smallest bucket >= n, so
        # host RAM scales with the actual cache, not max_cached_len. One
        # native store per bucket; `_user_bucket` remembers where each user
        # is so re-offloads at a different length don't leak rows.
        # Optional SSD tier (FlexKV CPU/SSD analogue,
        # flex_kvcache_manager.py:45): with ram_capacity_users set, the
        # least-recently-offloaded users beyond it spill to per-width
        # memmap arenas under ssd_dir and promote back on lookup.
        self._elems_per_token = (
            2 * cfg.num_layers * cfg.num_heads * cfg.head_dim
        )
        self._stores = {}
        self._user_bucket = {}
        self._NativeHostStore = NativeHostStore
        self._ram_cap = ram_capacity_users
        self._ssd_dir = ssd_dir
        self._ssd_stores = {}
        self._ssd_users = {}     # user -> width (rows living on SSD)
        self._lru = []           # RAM users, oldest first
        self.stats = {"ssd_spills": 0, "ssd_hits": 0}

    def _bucket(self, n: int) -> int:
        width = 1
        while width < n:
            width *= 2
        return min(width, self.cfg.max_cached_len)

    def _store_for(self, width: int):
        st = self._stores.get(width)
        if st is None:
            st = self._NativeHostStore(self._elems_per_token * width)
            self._stores[width] = st
        return st

    def __len__(self) -> int:
        return len(self._user_bucket) + len(self._ssd_users)

    def offload(self, state: KVCacheState, user_id: int) -> None:
        slot, cached = lookup_kvcache(
            state, jnp.asarray([user_id], jnp.int64)
        )
        n = int(cached[0])
        if int(slot[0]) < 0 or n == 0:
            return
        width = self._bucket(n)
        k, v, _ = gather_kvcache(state, self.cfg, slot, width)
        row = np.concatenate([
            np.asarray(k[:, 0], np.float32).reshape(-1),
            np.asarray(v[:, 0], np.float32).reshape(-1),
        ])[None]
        key = np.asarray([user_id], np.int64)
        old = self._user_bucket.get(int(user_id))
        if old is not None and old != width:
            self._stores[old].erase(key)
        self._store_for(width).put(key, row, np.asarray([n], np.int64))
        self._user_bucket[int(user_id)] = width
        uid = int(user_id)
        if uid in self._lru:
            self._lru.remove(uid)
        self._lru.append(uid)
        self._ssd_evict_one(uid)
        self._maybe_spill()

    def _ssd_store_for(self, width: int):
        st = self._ssd_stores.get(width)
        if st is None:
            import os as _os

            from recsys_examples_tpu.dynamicemb.tiered_storage import (
                SSDStore,
            )

            st = SSDStore(
                _os.path.join(self._ssd_dir, f"kv_w{width}.bin"),
                self._elems_per_token * width,
                capacity=max(self._ram_cap * 8, 64),
            )
            self._ssd_stores[width] = st
        return st

    def _ssd_evict_one(self, uid: int) -> None:
        w = self._ssd_users.pop(uid, None)
        if w is not None:
            self._ssd_stores[w].erase(np.asarray([uid], np.int64))

    def _maybe_spill(self) -> None:
        if not self._ram_cap or self._ssd_dir is None:
            return
        while len(self._lru) > self._ram_cap:
            uid = self._lru.pop(0)
            w = self._user_bucket.pop(uid, None)
            if w is None:
                continue
            st = self._stores[w]
            rows, found = st.get(np.asarray([uid], np.int64))
            if found[0]:
                n = self._score_of(st, uid)
                self._ssd_store_for(w).put(
                    np.asarray([uid], np.int64), rows,
                    np.asarray([n], np.int64),
                )
                self._ssd_users[uid] = w
                self.stats["ssd_spills"] += 1
            st.erase(np.asarray([uid], np.int64))

    def _score_of(self, st, uid: int) -> int:
        if st.native:
            import recsys_examples_tpu.utils.native as nat

            keys = np.asarray([uid], np.int64)
            scores = np.zeros((1,), np.int64)
            fnd = np.zeros((1,), np.uint8)
            buf = np.zeros((1, st.row_dim), np.float32)
            st._lib.host_store_get(
                st._h, nat._ptr(keys), nat._ptr(buf),
                nat._ptr(scores), nat._ptr(fnd), 1,
            )
            return int(scores[0]) if fnd[0] else 0
        return int(st._scores.get(uid, 0))

    def _promote_from_ssd(self, uid: int) -> bool:
        w = self._ssd_users.get(uid)
        if w is None:
            return False
        rows, scores, found = self._ssd_stores[w].get(
            np.asarray([uid], np.int64)
        )
        if not found[0]:
            self._ssd_users.pop(uid, None)
            return False
        self._store_for(w).put(
            np.asarray([uid], np.int64), rows, scores[:1]
        )
        self._user_bucket[uid] = w
        self._lru.append(uid)
        self._ssd_stores[w].erase(np.asarray([uid], np.int64))
        self._ssd_users.pop(uid, None)
        self.stats["ssd_hits"] += 1
        self._maybe_spill()
        return True

    def lookup(self, user_id: int) -> int:
        width = self._user_bucket.get(int(user_id))
        if width is None:
            if not self._promote_from_ssd(int(user_id)):
                return 0
            width = self._user_bucket[int(user_id)]
        rows, found = self._stores[width].get(
            np.asarray([user_id], np.int64)
        )
        if not found[0]:
            return 0
        # the valid token count rides in the score column
        st = self._stores[width]
        if st.native:
            import recsys_examples_tpu.utils.native as nat

            keys = np.asarray([user_id], np.int64)
            scores = np.zeros((1,), np.int64)
            fnd = np.zeros((1,), np.uint8)
            buf = np.zeros((1, st.row_dim), np.float32)
            st._lib.host_store_get(
                st._h, nat._ptr(keys), nat._ptr(buf),
                nat._ptr(scores), nat._ptr(fnd), 1,
            )
            return int(scores[0]) if fnd[0] else 0
        return int(st._scores.get(int(user_id), 0))

    def onboard(
        self, state: KVCacheState, user_id: int
    ) -> KVCacheState:
        n = self.lookup(user_id)
        if n == 0:
            return state
        width = self._user_bucket[int(user_id)]
        rows, found = self._stores[width].get(
            np.asarray([user_id], np.int64)
        )
        if not found[0]:
            return state
        cfg = self.cfg
        shape = (cfg.num_layers, width, cfg.num_heads, cfg.head_dim)
        half = self._elems_per_token * width // 2
        k = rows[0, :half].reshape(shape)[:, :n]
        v = rows[0, half:].reshape(shape)[:, :n]
        uid = jnp.asarray([user_id], jnp.int64)
        state, slots = allocate_kvcache(
            state, self.cfg, uid, jnp.asarray([n], jnp.int32)
        )
        state = append_kvcache(
            state, self.cfg, slots,
            jax.device_put(k)[:, None], jax.device_put(v)[:, None],
            jnp.asarray([n], jnp.int32),
        )
        return state
