"""Pooled (bag) dynamic-embedding lookup: SUM / MEAN over jagged ids.

Counterpart of the reference's pooled path (`gather_embedding_pooled`
corelib/dynamicemb/src/dynamic_emb_op.cu:106 and the EmbeddingBag sharder
dynamicemb/shard/embeddingbag.py:41): each sample's bag of ids maps to ONE
pooled vector per feature.

TPU design: the pooled reduction is expressed as a segment-sum over the
per-token unique-slot gather — XLA fuses the row gather into the reduce,
so no [T, dim] per-token tensor is materialized in HBM. The backward
broadcasts each sample's pooled gradient to its tokens (divided by the
bag length for MEAN) and reuses the sequence path's owner-side grad
reduction + fused optimizer (phase C).

Mixed-D grouping: features sharing a dim share one hash table through
`GroupedShardedDynamicEmbedding`; different dims use separate groups (TPU
lanes are 128-wide — padding a 32-dim table to a 128-dim group would
waste rows, so per-dim groups are the native layout).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from recsys_examples_tpu.dynamicemb.sharded_collection import (
    LookupResidual,
    ShardedDynamicEmbedding,
)


class PoolingMode:
    SUM = "sum"
    MEAN = "mean"


class PooledResidual(NamedTuple):
    inner: LookupResidual
    offsets: jax.Array       # [B+1]
    lengths: jax.Array       # [B]


def _sample_of_token(offsets: jax.Array, T: int) -> jax.Array:
    """[T] sample index per token row (static shapes; padding tokens map
    to the last sample and are masked by callers)."""
    B = offsets.shape[0] - 1
    t = jnp.arange(T, dtype=jnp.int32)
    s = jnp.searchsorted(offsets.astype(jnp.int32), t, side="right") - 1
    return jnp.clip(s, 0, B - 1)


class PooledDynamicEmbedding:
    """Bag-pooled facade over a ShardedDynamicEmbedding."""

    def __init__(
        self,
        inner: ShardedDynamicEmbedding,
        mode: str = PoolingMode.SUM,
    ):
        assert mode in (PoolingMode.SUM, PoolingMode.MEAN), mode
        self.inner = inner
        self.mode = mode

    def init_state(self):
        return self.inner.init_state()

    def forward(
        self,
        state,
        ids: jax.Array,        # [T] int64, jagged values (EMPTY_KEY pad ok)
        offsets: jax.Array,    # [B+1] int32
        train: bool = True,
    ) -> Tuple[object, jax.Array, PooledResidual]:
        """Returns (state, pooled [B, dim], residual)."""
        T = ids.shape[0]
        B = offsets.shape[0] - 1
        state, per_token, res = self.inner.forward(state, ids, train=train)
        seg = _sample_of_token(offsets, T)
        # mask tokens beyond each sample's bag (rows past offsets[-1])
        valid = jnp.arange(T, dtype=jnp.int32) < offsets[-1].astype(jnp.int32)
        contrib = jnp.where(valid[:, None], per_token, 0)
        pooled = jax.ops.segment_sum(contrib, seg, num_segments=B)
        lengths = (offsets[1:] - offsets[:-1]).astype(jnp.int32)
        if self.mode == PoolingMode.MEAN:
            denom = jnp.maximum(lengths, 1).astype(pooled.dtype)
            pooled = pooled / denom[:, None]
        return state, pooled, PooledResidual(res, offsets, lengths)

    def backward(
        self,
        state,
        res: PooledResidual,
        grad_pooled: jax.Array,  # [B, dim]
    ):
        """Phase C: broadcast pooled grads to tokens, then reuse the
        sequence path's owner-side reduction + fused optimizer."""
        T = res.inner.reverse_idx.shape[0]
        seg = _sample_of_token(res.offsets, T)
        g_tok = grad_pooled[seg]
        if self.mode == PoolingMode.MEAN:
            denom = jnp.maximum(res.lengths, 1).astype(grad_pooled.dtype)
            g_tok = g_tok / denom[seg][:, None]
        valid = (
            jnp.arange(T, dtype=jnp.int32)
            < res.offsets[-1].astype(jnp.int32)
        )
        g_tok = jnp.where(valid[:, None], g_tok, 0)
        return self.inner.backward(state, res.inner, g_tok)
