"""Model-parallel (row-sharded) dynamic embedding with all-to-all exchange.

TPU re-design of the reference's TorchRec integration
(`ShardedDynamicEmbeddingCollection` corelib/dynamicemb/dynamicemb/shard/
embedding.py:78; `RwSparseFeaturesDist` input_dist.py:199 — bucketize KJT
per rank then NCCL all-to-all, sequence embeddings all-to-all'd back).

TPU design (static shapes, ICI collectives, shard_map):
  - Table rows live on the owner rank: owner = mix64(key) mod world
    ("hash_roundrobin" dist_type; reference planner.py dist_type options).
    The splitmix64 finalizer defeats modular id structure (e.g. all-even
    ids), so per-owner load follows the binomial tail, not the id layout.
  - Exchange = fixed-capacity bucketed `lax.all_to_all`: each rank packs its
    (locally deduped) unique keys into a [W, cap] send buffer (the ragged
    all-to-all of the reference is not expressible under XLA's static
    shapes; cap has a safety factor over the balanced load u/W).
  - Overflow is NOT silent: keys past an owner bucket's cap fall back to
    transient-init embeddings in the forward, their phase-C grads are
    dropped for that step, and the count is returned in
    `LookupResidual.num_overflow`. The trainer surfaces it per step and
    `AdaptiveBucketing` raises `bucket_factor` (forcing a retrace at the
    larger cap) when overflow persists, so sustained under-training is
    impossible by construction.
  - Phase A (forward, non-diff): unique -> a2a ids -> owner lookup/insert ->
    a2a embeddings -> per-token gather. Returns per-token embeddings plus a
    routing residual.
  - Phase B (diff, caller): dense model consumes per-token embeddings.
  - Phase C (backward, non-diff): per-token grads -> local segment-sum by
    unique -> a2a -> owner-side segment-sum -> fused sparse optimizer.

The same code runs single-device (W=1: the a2a degenerates to identity).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from recsys_examples_tpu.dynamicemb.batched_table import (
    DynamicEmbeddingTable,
    DynamicEmbTableState,
)
from recsys_examples_tpu.dynamicemb.dynamicemb_config import EMPTY_KEY
from recsys_examples_tpu.dynamicemb.unique_op import segmented_unique
from recsys_examples_tpu.parallel.mesh import DATA_AXIS


class LookupResidual(NamedTuple):
    """Routing info from phase A needed by phase C (all per-rank arrays)."""

    reverse_idx: jax.Array   # [n] token -> local unique slot
    owner: jax.Array         # [n] dest rank per local unique
    pos: jax.Array           # [n] slot within dest bucket
    recv_keys: jax.Array     # [W*cap] keys this rank served
    recv_reverse: jax.Array  # [W*cap] recv -> owner-unique slot
    slots: jax.Array         # [W*cap] table slots of owner uniques
    num_unique: jax.Array    # [1] local unique count
    num_overflow: jax.Array  # [1] uniques past their owner bucket's cap


_N_RES = len(LookupResidual._fields)


def route_owner(keys: jax.Array, W: int) -> jax.Array:
    """Owner rank per key: splitmix64-mixed hash mod W ("hash_roundrobin").

    Mixing before the modulus makes per-owner load insensitive to id
    structure (dense ranges, all-even ids, tid<<58 grouped-feature tags),
    which is what makes a static bucket cap with a modest safety factor
    safe. Must stay in lockstep with :func:`route_owner_np` (the host-side
    mirror used by the hybrid-storage prefetch bucketing).

    The golden-gamma increment decorrelates this hash from the table's
    intra-shard bucket hash (`dynamicemb_config.hash_keys`, the bare
    splitmix64 finalizer): without it, every key on a shard satisfies
    mix64(key) == rank (mod W), so only num_buckets/W of the shard's
    hash buckets would ever be used — pathological eviction.
    """
    z = keys.astype(jnp.uint64) + jnp.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> 30)) * jnp.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> 27)) * jnp.uint64(0x94D049BB133111EB)
    z = z ^ (z >> 31)
    return (z % jnp.uint64(W)).astype(jnp.int32)


def route_owner_np(keys, W: int):
    """NumPy mirror of :func:`route_owner` (same bits, host-side)."""
    import numpy as np

    with np.errstate(over="ignore"):
        z = keys.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
        return (z % np.uint64(W)).astype(np.int32)


def _route(unique_keys: jax.Array, W: int, cap: int):
    """Assign each unique key an owner rank and a bucket position."""
    n = unique_keys.shape[0]
    active = unique_keys != EMPTY_KEY
    owner = jnp.where(
        active,
        route_owner(unique_keys, W),
        W,  # park padding in a virtual bucket
    )
    # position within owner's bucket = rank among same-owner keys
    order = jnp.argsort(owner)
    sorted_owner = owner[order]
    seg_start = jnp.searchsorted(sorted_owner, jnp.arange(W + 1, dtype=owner.dtype))
    pos_sorted = jnp.arange(n, dtype=jnp.int32) - seg_start[sorted_owner]
    pos = jnp.zeros((n,), jnp.int32).at[order].set(pos_sorted)
    overflow = active & (pos >= cap)
    owner = jnp.where(overflow, W, owner)
    return owner, pos, overflow


class ShardedDynamicEmbedding:
    """One row-sharded dynamic table + its exchange logic."""

    def __init__(
        self,
        table: DynamicEmbeddingTable,
        mesh: Optional[Mesh] = None,
        axis: str = DATA_AXIS,
        bucket_factor: float = 2.0,
    ):
        self.table = table
        self.mesh = mesh
        # axis may be a single mesh axis name or a tuple of axis names
        # (e.g. ("dcn", "data") for multi-slice row sharding: the table
        # rows distribute over the combined axis; XLA routes each
        # collective hop over its fabric — ICI within a slice, DCN
        # across — reference analogue: multi-node NCCL process groups)
        self.axis = axis
        if mesh is None:
            self.world = 1
        elif isinstance(axis, tuple):
            w = 1
            for a in axis:
                w *= mesh.shape[a]
            self.world = w
        else:
            self.world = mesh.shape[axis]
        self.bucket_factor = bucket_factor

    # ------------------------------------------------------------ helpers
    def _cap(self, n: int) -> int:
        if self.world == 1:
            return n
        cap = int(self.bucket_factor * (n + self.world - 1) // self.world)
        return max(8, min(n, (cap + 7) // 8 * 8))

    def init_state(self) -> DynamicEmbTableState:
        """Per-shard states; replicated over non-`axis` mesh dims."""
        if self.mesh is None:
            return self.table.init_state()

        def init_local():
            return self.table.init_state()

        out_specs = jax.tree.map(
            lambda _: P(self.axis) if _ndim_ge1(_) else P(),
            jax.eval_shape(init_local),
        )
        f = shard_map(
            init_local, mesh=self.mesh, in_specs=(), out_specs=out_specs,
            check_vma=False,
        )
        return f()

    # ------------------------------------------------------------ phase A
    def forward(
        self,
        state: DynamicEmbTableState,
        ids: jax.Array,     # [T] int64, sharded over axis (or local if W=1)
        train: bool = True,
    ):
        """Returns (state, per_token_emb [T, dim], residual)."""
        if self.mesh is None:
            return self._fwd_local(state, ids, train)
        # pad ids to a world multiple so the shard_map split is even
        # (EMPTY_KEY rows produce zero embeddings and are sliced off)
        n0 = ids.shape[0]
        pad = (-n0) % self.world
        if pad:
            ids = jnp.concatenate(
                [ids, jnp.full((pad,), EMPTY_KEY, ids.dtype)]
            )
        state_spec = jax.tree.map(
            lambda x: P(self.axis) if hasattr(x, "ndim") and x.ndim >= 1 else P(),
            state,
        )
        fn = functools.partial(self._fwd_local, train=train, _in_shmap=True)
        res_spec = LookupResidual(*([P(self.axis)] * _N_RES))
        f = shard_map(
            fn,
            mesh=self.mesh,
            in_specs=(state_spec, P(self.axis)),
            out_specs=(state_spec, P(self.axis), res_spec),
            check_vma=False,
        )
        state, emb, res = f(state, ids)
        if pad:
            emb = emb[:n0]
        return state, emb, res

    def _fwd_local(self, state, ids, train=True, _in_shmap=False):
        W = self.world
        table = self.table
        n = ids.shape[0]
        uk, rev, _, nu = segmented_unique(ids)
        cap = self._cap(n)

        if W == 1:
            if train:
                state, slots, uemb = table.forward_train(state, uk)
            else:
                uemb = table.forward_eval(state, uk)
                slots = jnp.full((n,), -1, jnp.int32)
            out = uemb[rev]
            valid = (ids != EMPTY_KEY)[:, None]
            out = jnp.where(valid, out, jnp.zeros((), out.dtype))
            res = LookupResidual(
                reverse_idx=rev,
                owner=jnp.zeros((n,), jnp.int32),
                pos=jnp.arange(n, dtype=jnp.int32),
                recv_keys=uk,
                recv_reverse=jnp.arange(n, dtype=jnp.int32),
                slots=slots,
                num_unique=nu.reshape(1),
                num_overflow=jnp.zeros((1,), jnp.int32),
            )
            return state, out, res

        owner, pos, overflow = _route(uk, W, cap)
        send_keys = jnp.full((W, cap), EMPTY_KEY, jnp.int64)
        # padding/overflow rows carry owner == W (out of bounds): they must
        # be DROPPED, not clamped — a clamped write lands in owner W-1's
        # bucket and clobbers a real key at the same position whenever the
        # rank's ids contain duplicates (uk padding slots)
        send_keys = send_keys.at[owner, pos].set(uk, mode="drop")
        safe_owner = jnp.minimum(owner, W - 1)
        ok = owner < W
        recv_keys = jax.lax.all_to_all(
            send_keys, self.axis, split_axis=0, concat_axis=0, tiled=True
        ).reshape(W * cap)

        ruk, rrev, _, rnu = segmented_unique(recv_keys)
        if train:
            state, slots, uemb = table.forward_train(state, ruk)
        else:
            uemb = table.forward_eval(state, ruk)
            slots = jnp.full((W * cap,), -1, jnp.int32)
        served = uemb[rrev]  # [W*cap, dim] embeddings per request
        served = served.reshape(W, cap, -1)
        got = jax.lax.all_to_all(
            served, self.axis, split_axis=0, concat_axis=0, tiled=True
        )  # [W, cap, dim]: got[j] = my bucket-j answers
        uemb_local = got[safe_owner, pos]
        # overflowed / padding keys -> transient init (or zeros)
        missing = ~ok
        if train:
            from recsys_examples_tpu.dynamicemb.initializer import (
                initialize_embeddings,
            )
            fallback = initialize_embeddings(
                uk, table.dim, table.options.initializer_args,
                table.options.value_dtype,
            )
        else:
            fallback = jnp.zeros_like(uemb_local)
        uemb_local = jnp.where(missing[:, None], fallback, uemb_local)
        uemb_local = jnp.where(
            (uk != EMPTY_KEY)[:, None], uemb_local, jnp.zeros((), uemb_local.dtype)
        )
        out = uemb_local[rev]
        valid = (ids != EMPTY_KEY)[:, None]
        out = jnp.where(valid, out, jnp.zeros((), out.dtype))
        res = LookupResidual(
            reverse_idx=rev, owner=owner, pos=pos,
            recv_keys=recv_keys, recv_reverse=rrev, slots=slots,
            num_unique=nu.reshape(1),
            num_overflow=jnp.sum(overflow, dtype=jnp.int32).reshape(1),
        )
        return state, out, res

    # ------------------------------------------------------------ phase C
    def backward(
        self,
        state: DynamicEmbTableState,
        res: LookupResidual,
        grad_out: jax.Array,  # [T, dim] sharded over axis
    ) -> DynamicEmbTableState:
        if self.mesh is None:
            return self._bwd_local(state, res, grad_out)
        # mirror forward's world-multiple padding (padding rows map to the
        # EMPTY_KEY unique slot whose grads are dropped by the table)
        pad = res.reverse_idx.shape[0] - grad_out.shape[0]
        if pad:
            grad_out = jnp.concatenate(
                [grad_out, jnp.zeros((pad,) + grad_out.shape[1:],
                                     grad_out.dtype)]
            )
        state_spec = jax.tree.map(
            lambda x: P(self.axis) if hasattr(x, "ndim") and x.ndim >= 1 else P(),
            state,
        )
        res_spec = LookupResidual(*([P(self.axis)] * _N_RES))
        f = shard_map(
            self._bwd_local,
            mesh=self.mesh,
            in_specs=(state_spec, res_spec, P(self.axis)),
            out_specs=state_spec,
            check_vma=False,
        )
        return f(state, res, grad_out)

    def _bwd_local(self, state, res, grad_out):
        W = self.world
        n = grad_out.shape[0]
        dim = grad_out.shape[1]
        # token grads -> local unique grads
        gu = jax.ops.segment_sum(
            grad_out.astype(jnp.float32), res.reverse_idx, num_segments=n
        )
        if W == 1:
            return self.table.backward(state, res.slots, gu)
        cap = res.recv_keys.shape[0] // W
        send = jnp.zeros((W, cap, dim), jnp.float32)
        # owner == W (padding/overflow) grads are dropped, mirroring the
        # forward's send packing
        send = send.at[res.owner, res.pos].add(gu, mode="drop")
        recv = jax.lax.all_to_all(
            send, self.axis, split_axis=0, concat_axis=0, tiled=True
        ).reshape(W * cap, dim)
        # aggregate per owner-unique key (duplicates across source ranks)
        gu_owner = jax.ops.segment_sum(
            recv, res.recv_reverse, num_segments=W * cap
        )
        return self.table.backward(state, res.slots, gu_owner)


def _ndim_ge1(x) -> bool:
    return hasattr(x, "ndim") and x.ndim >= 1


class AdaptiveBucketing:
    """Grow `bucket_factor` when a2a bucket overflow persists.

    The exchange cap is a trace-time constant (`_cap` rounds
    `bucket_factor * n / W`), so growing the factor changes the compiled
    step — the caller must re-jit after `observe()` returns True.
    Reference analogue: the ragged NCCL all-to-all never overflows
    (`input_dist.py:81` bucketize handles arbitrary skew by construction);
    here the static cap plus this policy gives the same no-silent-loss
    contract with at most `patience` under-trained steps per growth.
    """

    def __init__(self, tables, patience: int = 2, growth: float = 1.5,
                 max_factor: float = 16.0):
        self.tables = list(tables)  # ShardedDynamicEmbedding instances
        self.patience = patience
        self.growth = growth
        self.max_factor = max_factor
        self._streak = 0

    def observe(self, overflow_total) -> bool:
        """Feed the step's total overflow count. Returns True when the
        bucket factors were just grown (caller must re-jit the step)."""
        if int(overflow_total) <= 0:
            self._streak = 0
            return False
        self._streak += 1
        if self._streak < self.patience:
            return False
        self._streak = 0
        grew = False
        for t in self.tables:
            nf = min(t.bucket_factor * self.growth, self.max_factor)
            if nf > t.bucket_factor:
                t.bucket_factor = nf
                grew = True
        return grew


class GroupedShardedDynamicEmbedding:
    """Several sparse features served by ONE fused table pass.

    Counterpart of the reference's table grouping
    (`BatchedDynamicEmbeddingTablesV2` groups same-dim tables so dedup,
    lookup, insert and the id all-to-all each run once per step;
    segmented_unique's (table_id, key) compound contract,
    corelib/dynamicemb/src/unique_op.h:27). Keys are made table-unique by
    packing the feature index into the top bits of the int64 key space
    (keys must stay below 2^58).
    """

    _TID_SHIFT = 58

    def __init__(
        self,
        table: DynamicEmbeddingTable,
        feature_names: Tuple[str, ...],
        mesh: Optional[Mesh] = None,
        axis: str = DATA_AXIS,
        bucket_factor: float = 2.0,
    ):
        assert len(feature_names) < (1 << 5), "too many grouped features"
        self.feature_names = tuple(feature_names)
        self.inner = ShardedDynamicEmbedding(
            table, mesh=mesh, axis=axis, bucket_factor=bucket_factor
        )
        self.table = table
        self.mesh = mesh

    def init_state(self) -> DynamicEmbTableState:
        return self.inner.init_state()

    def _compose(self, ids: jax.Array, tid: int) -> jax.Array:
        active = ids != EMPTY_KEY
        # An id outside [0, 2^58) would alias into another feature's key
        # space; map offenders to EMPTY_KEY (skipped) instead of silently
        # corrupting a different feature's embeddings.
        in_range = (ids >= 0) & (ids < (jnp.int64(1) << self._TID_SHIFT))
        tagged = ids + (jnp.int64(tid) << self._TID_SHIFT)
        return jnp.where(active & in_range, tagged, EMPTY_KEY)

    def forward(self, state, ids_by_feature, train: bool = True):
        """ids_by_feature: {name: [T_f] int64}. Returns
        (state, {name: [T_f, dim]}, residual)."""
        parts = []
        sizes = []
        for i, name in enumerate(self.feature_names):
            ids = ids_by_feature[name]
            parts.append(self._compose(ids, i))
            sizes.append(ids.shape[0])
        all_ids = jnp.concatenate(parts)
        state, emb, res = self.inner.forward(state, all_ids, train=train)
        out = {}
        off = 0
        for name, sz in zip(self.feature_names, sizes):
            out[name] = emb[off:off + sz]
            off += sz
        return state, out, res

    def backward(self, state, res, grads_by_feature):
        g = jnp.concatenate(
            [grads_by_feature[n] for n in self.feature_names]
        )
        return self.inner.backward(state, res, g)
