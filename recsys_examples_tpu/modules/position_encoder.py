"""HSTU positional (+ timestamp) encoder.

Semantics mirror the reference (examples/hstu/modules/position_encoder.py:71
`HSTUPositionalEncoder`; index math: examples/hstu/ops/triton_ops/
triton_position.py — position index of token i within its sequence is
`min(i, high_ind)` where `high_ind = clamp(seqlen - num_targets,
max=num_buckets-1)`; embedding added to `x * sqrt(dim)`).

On TPU this is a plain masked gather-add — XLA fuses it; no kernel needed.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from recsys_examples_tpu.ops.jagged import jagged_to_padded_dense, row_to_batch


def _position_embed_add(x, pos_w, idx, offsets, high, *, alpha, nmax):
    """x * alpha + pos_w[idx], with a custom VJP for d(pos_w).

    The autodiff transpose of the row gather is a row SCATTER-ADD of [T, D]
    grads into the [P, D] table — serialized on the TPU scalar core it was
    the single most expensive op of the train step (~4.7 ms at the bench
    shape). The position index is `min(pos_in_sample, high_b)`, so the
    gradient decomposes into (a) a batch-sum of the padded-dense grad rows
    for positions below each sample's clamp (pure gather + reduction) and
    (b) a B-row scatter of the per-sample clamped-tail sums — both
    vector-friendly."""

    @jax.custom_vjp
    def f(x, pos_w, idx, offsets, high):
        return x * alpha + pos_w[idx].astype(x.dtype)

    def fwd(x, pos_w, idx, offsets, high):
        return f(x, pos_w, idx, offsets, high), (offsets, high, pos_w.shape)

    def bwd(res, g):
        offsets, high, (P, D) = res
        dx = (g * alpha).astype(g.dtype)
        # padded-dense in g's dtype (bf16 in training) — halves the HBM
        # traffic of the materialized [B, nmax, D] buffer; accumulate the
        # batch reduction in f32
        G = jagged_to_padded_dense(g, offsets, nmax)  # [B, nmax, D]
        posm = (
            jnp.arange(nmax, dtype=jnp.int32)[None, :] < high[:, None]
        )
        zero = jnp.zeros((), G.dtype)
        dP1 = jnp.where(posm[..., None], G, zero).sum(
            axis=0, dtype=jnp.float32
        )  # [nmax, D]
        dpos = jnp.zeros((P, D), jnp.float32)
        k = min(nmax, P)
        dpos = dpos.at[:k].add(dP1[:k])
        tail = jnp.where(~posm[..., None], G, zero).sum(
            axis=1, dtype=jnp.float32
        )  # [B, D]
        dpos = dpos.at[high].add(tail)
        return dx, dpos, None, None, None

    f.defvjp(fwd, bwd)
    return f(x, pos_w, idx, offsets, high)


class HSTUPositionalEncoder(nn.Module):
    num_position_buckets: int
    num_time_buckets: int
    embedding_dim: int
    use_time_encoding: bool = False

    @nn.compact
    def __call__(
        self,
        seq_embeddings: jax.Array,   # [T, D]
        seq_lengths: jax.Array,      # [B]
        seq_offsets: jax.Array,      # [B+1]
        num_targets: Optional[jax.Array] = None,
        seq_timestamps: Optional[jax.Array] = None,  # [T]
        seq_start_position: Optional[jax.Array] = None,  # [B]
        max_seqlen: int = 0,  # static per-sample length bound (enables the
                              # scatter-free d(pos_w) custom VJP)
    ) -> jax.Array:
        T, D = seq_embeddings.shape
        pos_w = self.param(
            "position_embeddings",
            nn.initializers.uniform(scale=2.0 / (self.num_position_buckets ** 0.5)),
            (self.num_position_buckets, D),
        )
        # uniform(-a, a): flax uniform is [0, scale); shift to be symmetric
        pos_w = pos_w - 1.0 / (self.num_position_buckets ** 0.5)

        alpha = self.embedding_dim ** 0.5
        b = row_to_batch(seq_offsets, T)
        pos = jnp.arange(T, dtype=jnp.int32) - seq_offsets[b].astype(jnp.int32)
        high = seq_lengths.astype(jnp.int32)
        if num_targets is not None:
            high = high - num_targets.astype(jnp.int32)
        high = jnp.clip(high, 0, self.num_position_buckets - 1)
        if seq_start_position is not None:
            pos = pos + seq_start_position.astype(jnp.int32)[b]
        idx = jnp.minimum(pos, high[b])
        if max_seqlen > 0 and seq_start_position is None:
            out = _position_embed_add(
                seq_embeddings, pos_w, idx,
                seq_offsets.astype(jnp.int32), high,
                alpha=alpha, nmax=max_seqlen,
            )
        else:
            out = (
                seq_embeddings * alpha
                + pos_w[idx].astype(seq_embeddings.dtype)
            )

        if self.use_time_encoding:
            ts_w = self.param(
                "timestamp_embeddings",
                nn.initializers.uniform(scale=2.0 / (self.num_time_buckets ** 0.5)),
                (self.num_time_buckets + 1, D),
            )
            ts_w = ts_w - 1.0 / (self.num_time_buckets ** 0.5)
            if seq_timestamps is None:
                raise ValueError("use_time_encoding requires seq_timestamps")
            # sqrt bucketization of time deltas vs the sequence's last event
            last_idx = jnp.clip(
                seq_offsets[b + 1].astype(jnp.int32) - 1, 0, T - 1
            )
            delta = jnp.maximum(
                seq_timestamps[last_idx] - seq_timestamps, 0
            ).astype(jnp.float32)
            bucket = jnp.sqrt(delta).astype(jnp.int32)
            bucket = jnp.clip(bucket, 0, self.num_time_buckets)
            out = out + ts_w[bucket].astype(seq_embeddings.dtype)

        total = seq_offsets[-1]
        valid = (jnp.arange(T, dtype=jnp.int32) < total)[:, None]
        return jnp.where(valid, out, jnp.zeros((), out.dtype))


def t5_relative_buckets(
    rel: jax.Array, num_buckets: int, max_distance: int, causal: bool
) -> jax.Array:
    """T5-style log-bucketed relative positions (rel = q_pos - k_pos)."""
    n = num_buckets
    if causal:
        rel = jnp.maximum(rel, 0)
        base = jnp.zeros_like(rel)
    else:
        n = n // 2
        base = (rel < 0).astype(jnp.int32) * n
        rel = jnp.abs(rel)
    max_exact = n // 2
    is_small = rel < max_exact
    large = max_exact + (
        jnp.log(jnp.maximum(rel, 1).astype(jnp.float32) / max_exact)
        / jnp.log(max_distance / max_exact)
        * (n - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, n - 1)
    return base + jnp.where(is_small, rel, large)


class RelativeAttentionBias(nn.Module):
    """Trainable relative attention bias producing the dense rab tensor the
    HSTU attention contract takes (reference: rab/has_drab arguments of
    hstu_attn_varlen_func, corelib/hstu/hstu_attn/hstu_attn_interface.py:185;
    bias construction mirrors the relative position/time bias of the HSTU
    lineage). Returns [1, H, N, N]."""

    num_heads: int
    num_buckets: int = 128
    max_distance: int = 1024
    causal: bool = True

    @nn.compact
    def __call__(self, max_seqlen: int) -> jax.Array:
        w = self.param(
            "rel_bias",
            nn.initializers.normal(0.02),
            (self.num_buckets, self.num_heads),
        )
        pos = jnp.arange(max_seqlen, dtype=jnp.int32)
        rel = pos[:, None] - pos[None, :]
        bucket = t5_relative_buckets(
            rel, self.num_buckets, self.max_distance, self.causal
        )
        rab = w[bucket]                         # [N, N, H]
        return rab.transpose(2, 0, 1)[None]     # [1, H, N, N]
