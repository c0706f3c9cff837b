"""Hybrid HBM + host-RAM embedding storage with prefetch.

Counterpart of the reference's storage tiers
(corelib/dynamicemb/dynamicemb/key_value_table.py:2107 `HybridStorage`,
:1522 `DynamicEmbCache`, prefetch path
batched_dynamicemb_function.py:298 `_prefetch_cache_path`,
:699 `dynamicemb_prefetch`):

  - device tier: the bucketized HashTableState in HBM (the "cache")
  - host tier: numpy-backed key->row store (UVM/VMM equivalent on TPU is
    plain host RAM; capacity = RAM)
  - prefetch(keys): before the jitted train step, pull the batch's missing
    keys from host into the device table (insert_and_evict) and flush the
    evicted rows back to host. The train step then hits HBM only.

Prefetch runs host-side one batch ahead (the reference's dedicated
prefetch pipeline stage); overlap comes from dispatching the device insert
before the previous step's outputs are consumed.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from recsys_examples_tpu.dynamicemb.batched_table import (
    DynamicEmbeddingTable,
    DynamicEmbTableState,
)
from recsys_examples_tpu.dynamicemb.dynamicemb_config import EMPTY_KEY
from recsys_examples_tpu.dynamicemb.hashtable import (
    export_batch,
    insert_and_evict,
    lookup,
)


class HostStorage:
    """Host-RAM key -> (value row, score) store backed by the native C++
    store (csrc/host_store.cpp) — counterpart of the reference's host/UVM
    tier (DynamicEmbStorage host side, key_value_table.py:2107) whose hot
    path is likewise native."""

    def __init__(self, value_dim: int):
        from recsys_examples_tpu.utils.native import NativeHostStore

        self.value_dim = value_dim
        self._store = NativeHostStore(value_dim)

    def __len__(self):
        return len(self._store)

    def get_batch(self, keys: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """(values [n, vd], found [n]) for int64 keys."""
        return self._store.get(np.asarray(keys, np.int64))

    def put_batch(
        self, keys: np.ndarray, values: np.ndarray, scores: np.ndarray
    ) -> None:
        keys = np.asarray(keys, np.int64)
        live = keys != int(EMPTY_KEY)
        self._store.put(
            keys[live],
            np.asarray(values, np.float32)[live],
            np.asarray(scores, np.int64)[live],
        )

    def pop(self, key: int) -> None:
        self._store.erase(np.asarray([key], np.int64))

    def export(self, score_threshold: int = 0):
        return self._store.export(score_threshold)


def _insert_flush_op(
    table, keys, scores, emb, opt_rows, have_row, *, opt_args, init_args,
    value_dtype, rounds,
):
    """Jitted device side of prefetch: init fresh rows, insert (evicting
    min-score victims), and gather the victims' PRE-insert rows for the
    host flush — all in one dispatch, no full-table host copies.

    keys/scores [n]; emb [n, dim]; opt_rows [n, opt_dim] or None;
    have_row [n] bool (False -> row comes from the key-seeded initializer).
    Returns (new_table, victim_keys [n], victim_scores [n],
    victim_rows [n, value_dim], placed [n]) with EMPTY_KEY marking
    no-victim lanes. `placed` is False where the insert could not claim a
    slot within `rounds` (bucket contention) — those keys are NOT
    resident on device and their host rows must be preserved.
    """
    from recsys_examples_tpu.dynamicemb.initializer import (
        initialize_embeddings,
    )
    from recsys_examples_tpu.dynamicemb.optimizer import initial_opt_row

    dim = emb.shape[1]
    n = keys.shape[0]
    init_e = initialize_embeddings(keys, dim, init_args, value_dtype)
    emb = jnp.where(have_row[:, None], emb, init_e.astype(emb.dtype))
    if opt_rows is not None:
        init_o = initial_opt_row(
            opt_args.optimizer, n, dim, opt_args, value_dtype
        )
        opt_rows = jnp.where(
            have_row[:, None], opt_rows, init_o.astype(opt_rows.dtype)
        )
    old_keys = table.keys.reshape(-1)
    old_scores = table.scores.reshape(-1)
    new_table, slots, evicted = insert_and_evict(
        table, keys, scores, emb, opt_rows,
        update_existing_values=True, rounds=rounds,
    )
    has_victim = evicted & (slots >= 0)
    vslots = jnp.where(has_victim, slots, 0)
    vkeys = jnp.where(has_victim, old_keys[vslots], EMPTY_KEY)
    vscores = old_scores[vslots]
    vrows = table.values[vslots]
    if table.opt is not None:
        vrows = jnp.concatenate([vrows, table.opt[vslots]], axis=1)
    placed = (slots >= 0) & (keys != EMPTY_KEY)
    return new_table, vkeys, vscores, vrows, placed


class HybridDynamicEmbedding:
    """Device table (cache) + host tier; prefetch keeps the working set in
    HBM so the jitted step never misses to host.

    With `mesh`, composes with the row-sharded path (VERDICT r2 #4;
    reference: HybridStorage under TorchRec row-wise sharding,
    key_value_table.py:2107 + planner): each rank's table shard acts as
    the cache for the keys it owns (owner = mix64(key) % world, matching
    sharded_collection._route), prefetch routes per-owner key buckets
    through ONE shard_map'd lookup + ONE shard_map'd insert-and-flush, and
    the host tier holds the evicted cold rows. Tables larger than
    world x per-chip HBM then train multi-chip.
    """

    def __init__(
        self,
        table: DynamicEmbeddingTable,
        host_storage=None,
        mesh=None,
        axis=None,
    ):
        from recsys_examples_tpu.parallel.mesh import DATA_AXIS

        self.table = table
        self.mesh = mesh
        self.axis = axis or DATA_AXIS
        if mesh is None:
            self.world = 1
        elif isinstance(self.axis, tuple):
            w = 1
            for a in self.axis:
                w *= mesh.shape[a]
            self.world = w
        else:
            self.world = mesh.shape[self.axis]
        # host tier: plain RAM store by default; pass a
        # tiered_storage.TieredHostStorage to cap RAM and spill the cold
        # tail to SSD (reference: FlexKV CPU/SSD tiers)
        self.host = host_storage or HostStorage(table.value_dim)
        # cache-stats probes (reference: commons/utils/dynamicemb_cache_stats
        # auto_install hit-rate tracking)
        self.stats = {
            "lookups": 0, "device_hits": 0, "host_onboards": 0,
            "evict_flushes": 0, "insert_failures": 0,
        }

    def init_state(self) -> DynamicEmbTableState:
        if self.mesh is None:
            return self.table.init_state()
        from recsys_examples_tpu.dynamicemb.sharded_collection import (
            ShardedDynamicEmbedding,
        )

        return ShardedDynamicEmbedding(
            self.table, mesh=self.mesh, axis=self.axis
        ).init_state()

    # ---------------------------------------------------- device ops
    def _pack(self, ukeys: np.ndarray):
        """Route unique keys into per-owner fixed-capacity buckets
        [W, cap] (owner = mix64(key) %% W via route_owner_np, in lockstep
        with sharded_collection._route); power-of-two cap so each distinct
        cap compiles once."""
        W = self.world
        if W == 1:
            cap = 1 << max(int(np.ceil(np.log2(max(len(ukeys), 1)))), 6)
            dk = np.full((1, cap), int(EMPTY_KEY), np.int64)
            dk[0, : len(ukeys)] = ukeys
            return dk
        from recsys_examples_tpu.dynamicemb.sharded_collection import (
            route_owner_np,
        )

        owner = route_owner_np(ukeys, W).astype(np.int64)
        counts = np.bincount(owner, minlength=W)
        cap = 1 << max(int(np.ceil(np.log2(max(counts.max(), 1)))), 6)
        dk = np.full((W, cap), int(EMPTY_KEY), np.int64)
        order = np.argsort(owner, kind="stable")
        pos = np.arange(len(ukeys)) - np.concatenate(
            [[0], np.cumsum(counts)]
        )[owner[order]]
        dk[owner[order], pos] = ukeys[order]
        return dk

    def _ops(self, cap: int):
        """(lookup_fn, insert_flush_fn) for bucket width `cap`, cached."""
        if not hasattr(self, "_op_cache"):
            self._op_cache = {}
        if cap in self._op_cache:
            return self._op_cache[cap]
        import functools

        table = self.table
        ifl = functools.partial(
            _insert_flush_op,
            opt_args=table.opt_args,
            init_args=table.options.initializer_args,
            value_dtype=table.options.value_dtype,
            rounds=table.options.insert_rounds,
        )
        has_opt = table.opt_dim > 0

        def local_lookup(tstate, dk):  # dk [1, cap]
            _, found = lookup(tstate.table, dk[0])
            return found[None]

        def local_insert(tstate, dk, scores, emb, opt, have):
            new_table, vk, vs, vr, placed = ifl(
                tstate.table, dk[0], scores[0], emb[0],
                opt[0] if has_opt else None, have[0],
            )
            return (
                tstate.replace(table=new_table),
                vk[None], vs[None], vr[None], placed[None],
            )

        if self.mesh is None:
            lk = jax.jit(local_lookup)
            ins = jax.jit(local_insert, donate_argnums=(0,))
        else:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            ax = self.axis
            state_spec = jax.tree.map(
                lambda x: P(ax)
                if hasattr(x, "ndim") and x.ndim >= 1
                else P(),
                jax.eval_shape(self.init_state),
            )
            row = P(ax, None)
            lk = jax.jit(shard_map(
                local_lookup, mesh=self.mesh,
                in_specs=(state_spec, row), out_specs=row,
                check_vma=False,
            ))
            ins = jax.jit(shard_map(
                local_insert, mesh=self.mesh,
                in_specs=(state_spec, row, row, P(ax, None, None),
                          P(ax, None, None), row),
                out_specs=(state_spec, row, row, P(ax, None, None), row),
                check_vma=False,
            ), donate_argnums=(0,))
        self._op_cache[cap] = (lk, ins)
        return self._op_cache[cap]

    def prefetch(
        self, state: DynamicEmbTableState, keys: np.ndarray
    ) -> DynamicEmbTableState:
        """Move the batch's host-resident keys into the device table(s),
        flushing evicted rows to host (reference: dynamicemb_prefetch
        batched_dynamicemb_function.py:699). Write-allocate: keys in
        NEITHER tier are inserted here with the key-seeded initializer
        (instead of silently during the train step, whose evictions would
        bypass the host flush and lose rows) — the jitted step then only
        ever hits HBM (reference: _prefetch_cache_path inserts all misses,
        function.py:298)."""
        keys = np.asarray(keys).reshape(-1)
        ukeys = np.unique(keys[keys != int(EMPTY_KEY)])
        if len(ukeys) == 0:
            return state
        dk = self._pack(ukeys)
        W, cap = dk.shape
        lk, ins = self._ops(cap)
        found = np.asarray(lk(state, jnp.asarray(dk)))
        active = dk != int(EMPTY_KEY)
        self.stats["lookups"] += len(ukeys)
        self.stats["device_hits"] += int(found[active].sum())
        miss = active & ~found
        miss_flat = np.where(miss.reshape(-1))[0]
        if len(miss_flat) == 0:
            return state
        miss_keys = dk.reshape(-1)[miss_flat]
        host_vals, host_found = self.host.get_batch(miss_keys)
        self.stats["host_onboards"] += int(host_found.sum())

        dim = self.table.dim
        vd = self.table.value_dim
        dt = np.float32
        ins_keys = np.where(miss, dk, int(EMPTY_KEY))
        embf = np.zeros((W * cap, dim), dt)
        optf = np.zeros((W * cap, max(self.table.opt_dim, 1)), dt)
        havef = np.zeros((W * cap,), bool)
        hit_rows = miss_flat[host_found]
        hv = host_vals[host_found]
        embf[hit_rows] = hv[:, :dim]
        if self.table.opt_dim > 0 and hv.shape[1] >= vd:
            optf[hit_rows] = hv[:, dim:vd]
        havef[hit_rows] = True

        score = int(np.asarray(state.step).reshape(-1)[0]) + 1
        state, vkeys, vscores, vrows, placed = ins(
            state,
            jnp.asarray(ins_keys),
            jnp.full((W, cap), score, jnp.int64),
            jnp.asarray(embf.reshape(W, cap, dim),
                        dtype=self.table.options.value_dtype),
            jnp.asarray(optf.reshape(W, cap, -1),
                        dtype=self.table.options.value_dtype),
            jnp.asarray(havef.reshape(W, cap)),
        )
        vkeys = np.asarray(vkeys).reshape(-1)
        live = vkeys != int(EMPTY_KEY)
        if live.any():
            self.host.put_batch(
                vkeys[live],
                np.asarray(vrows).reshape(W * cap, -1)[live],
                np.asarray(vscores).reshape(-1)[live],
            )
            self.stats["evict_flushes"] += int(live.sum())
        # drop ONLY the keys that actually landed on device from host —
        # an insert can fail to claim a slot within insert_rounds under
        # extreme bucket contention (slots == -1); erasing those would
        # permanently lose their trained host rows
        placed_flat = np.asarray(placed).reshape(-1)
        landed = miss_keys[placed_flat[miss_flat]]
        n_failed = len(miss_keys) - len(landed)
        if n_failed:
            self.stats["insert_failures"] += n_failed
        if len(landed):
            self.host._store.erase(np.asarray(landed, np.int64))
        return state

    def flush_all(self, state: DynamicEmbTableState) -> None:
        """Flush the whole device table to host (reference: flush_cache
        key_value_table.py:2776) — used before a full dump."""
        nb = state.table.num_buckets
        step = max(1, min(nb, 4096))
        for start in range(0, nb, step):
            cnt = min(step, nb - start)
            k, s, v, valid, o = export_batch(state.table, start, cnt)
            k, s, v, valid = map(np.asarray, (k, s, v, valid))
            if o is not None:
                v = np.concatenate([v, np.asarray(o)], axis=1)
            self.host.put_batch(k[valid], v[valid], s[valid])

    def hit_rate(self) -> float:
        """Device-tier hit rate since start (reference cache-stats probe)."""
        lk = self.stats["lookups"]
        return self.stats["device_hits"] / lk if lk else 1.0
