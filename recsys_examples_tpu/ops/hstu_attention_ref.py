"""Reference (pure-jnp, dense-padded) HSTU attention with the full mask zoo.

This is the correctness twin for the Pallas varlen kernel, mirroring the
semantics of the reference implementation
(reference: examples/hstu/ops/pt_ops/pt_hstu_attention.py:150 `pytorch_hstu_mha`
and :46 `_get_valid_attn_mask`; kernel contract
corelib/hstu/hstu_attn/hstu_attn_interface.py:185).

HSTU attention is SiLU attention, not softmax:

    P = silu(q @ k^T * alpha) / scaling_seqlen * valid_mask
    out = P @ v

Mask zoo (composable):
  - causal / non-causal (non-causal = |dist| > 0 symmetric)
  - contextual tokens: first `num_contextuals[b]` tokens share position 0 and
    attend to (and are attended by) the whole valid sequence
  - target tokens: last `num_targets[b]` tokens form groups of
    `target_group_size`; inter-group attention is purged, intra-group kept
  - local window: row_col_dist <= max_attn_len (+ min_full_attn_seq_len tail)
"""
from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from recsys_examples_tpu.ops.jagged import (
    jagged_to_padded_dense,
    padded_dense_to_jagged,
)


def get_valid_attn_mask(
    causal: bool,
    N: int,
    seq_lengths: jax.Array,
    num_targets: Optional[jax.Array] = None,
    max_attn_len: int = 0,
    num_contextuals: Optional[Union[int, jax.Array]] = None,
    min_full_attn_seq_len: int = 0,
    target_group_size: int = 1,
) -> jax.Array:
    """[B, N, N] bool mask. Mirrors reference `_get_valid_attn_mask`."""
    B = seq_lengths.shape[0]
    ids = jnp.arange(N, dtype=jnp.int32)[None, :]  # [1, N]
    max_ids = seq_lengths.astype(jnp.int32).reshape(B, 1, 1)
    has_context = num_contextuals is not None and not (
        isinstance(num_contextuals, int) and num_contextuals == 0
    )
    if has_context:
        if isinstance(num_contextuals, int):
            ctx = jnp.full((B, 1), num_contextuals, dtype=jnp.int32)
        else:
            ctx = num_contextuals.astype(jnp.int32).reshape(B, 1)
        # contextual tokens collapse onto position 0; history starts at 1
        ids = jnp.maximum(ids - ctx + 1, 0)  # [B, N]
        max_ids = max_ids - ctx.reshape(B, 1, 1) + 1
    else:
        ids = jnp.broadcast_to(ids, (B, N))
    row_ids = ids[:, :, None]  # [B, N, 1] -> broadcast [B, N, N]
    col_ids = ids[:, None, :]
    row_col_dist = row_ids - col_ids
    valid = jnp.eye(N, dtype=bool)[None]
    if not causal:
        row_col_dist = jnp.where(row_col_dist > 0, row_col_dist, -row_col_dist)
    valid = jnp.logical_or(valid, row_col_dist > 0)

    if num_targets is not None:
        nt = num_targets.astype(jnp.int32).reshape(B, 1, 1)
        # group index of each target token (floor div; -1 clamps history)
        tg_row = jnp.maximum(row_ids - max_ids + nt, -1) // target_group_size
        tg_col = jnp.maximum(col_ids - max_ids + nt, -1) // target_group_size
        target_dist = tg_row - tg_col
        tg_mask = jnp.logical_or(
            target_dist == 0, jnp.logical_or(tg_row < 0, tg_col < 0)
        )
        valid = jnp.logical_and(valid, tg_mask)
        max_ids = max_ids - nt

    if max_attn_len > 0:
        if min_full_attn_seq_len > 0:
            valid = jnp.logical_and(
                valid,
                jnp.logical_or(
                    row_col_dist <= max_attn_len,
                    row_ids >= max_ids - min_full_attn_seq_len,
                ),
            )
        else:
            valid = jnp.logical_and(valid, row_col_dist <= max_attn_len)

    if has_context:
        # contextual rows (position 0) attend to the full valid sequence
        valid = jnp.logical_or(
            valid, jnp.logical_and(row_ids == 0, col_ids < max_ids)
        )
    return valid


def hstu_mha_reference(
    max_seq_len: int,
    alpha: float,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    seq_offsets: jax.Array,
    causal: bool = True,
    num_targets: Optional[jax.Array] = None,
    num_contextuals: Optional[Union[int, jax.Array]] = None,
    max_attn_len: int = 0,
    target_group_size: int = 1,
    scaling_seqlen: int = -1,
    rab: Optional[jax.Array] = None,  # [B|1, H|1, N, N] relative attn bias
) -> jax.Array:
    """Jagged HSTU multi-head attention, dense-padded reference path.

    q, k: [T, H, D]; v: [T, H, V]; seq_offsets: [B+1].
    Returns [T, H, V]. Padding rows of the output are zero.
    """
    if scaling_seqlen == -1:
        scaling_seqlen = max_seq_len
    T, H, D = q.shape
    V = v.shape[2]
    N = max_seq_len

    def pad(x):
        flat = x.reshape(T, -1)
        d = jagged_to_padded_dense(flat, seq_offsets, N)  # [B, N, H*d]
        return d.reshape(d.shape[0], N, H, -1).transpose(0, 2, 1, 3)  # [B,H,N,d]

    pq, pk, pv = pad(q), pad(k), pad(v)
    qk = jnp.einsum(
        "bhxa,bhya->bhxy", pq, pk, preferred_element_type=jnp.float32
    ) * alpha
    if rab is not None:
        qk = qk + rab[:, :, :N, :N].astype(jnp.float32)
    p = jax.nn.silu(qk) * (1.0 / scaling_seqlen)
    seq_lengths = seq_offsets[1:] - seq_offsets[:-1]
    mask = get_valid_attn_mask(
        causal=causal,
        N=N,
        seq_lengths=seq_lengths,
        num_targets=num_targets,
        max_attn_len=max_attn_len,
        num_contextuals=num_contextuals,
        target_group_size=target_group_size,
    )
    p = p * mask[:, None, :, :].astype(p.dtype)
    out = jnp.einsum(
        "bhxy,bhyv->bhxv", p.astype(pv.dtype), pv,
        preferred_element_type=jnp.float32,
    )  # [B, H, N, V]
    out = out.transpose(0, 2, 1, 3).reshape(-1, N, H * V)
    jag = padded_dense_to_jagged(out.astype(v.dtype), seq_offsets, T)
    return jag.reshape(T, H, V)


def hstu_cached_mha_reference(
    N: int,
    scaling_seqlen: int,
    alpha: float,
    delta_q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    delta_x_offsets: jax.Array,
    seq_offsets: jax.Array,
    num_targets: Optional[jax.Array] = None,
    max_attn_len: int = 0,
) -> jax.Array:
    """Delta-q (KV-cached inference) HSTU attention reference.

    delta_q: [L, H, D] new-token queries (L = B * delta_len, equal per batch);
    k/v: [T, H, D] full jagged keys/values; delta_x_offsets: [L] global
    positions of the new tokens. Mirrors reference `pytorch_cached_hstu_mha`
    (pt_hstu_attention.py:229).
    """
    L, H, D = delta_q.shape
    V = v.shape[2]
    B = seq_offsets.shape[0] - 1
    T = k.shape[0]
    dq = delta_q.reshape(B, -1, H, D).transpose(0, 2, 1, 3)  # [B,H,dL,D]

    def pad(x):
        flat = x.reshape(T, -1)
        d = jagged_to_padded_dense(flat, seq_offsets, N)
        return d.reshape(B, N, H, -1).transpose(0, 2, 1, 3)

    fk, fv = pad(k), pad(v)
    qk = jnp.einsum(
        "bhxa,bhya->bhxy", dq, fk, preferred_element_type=jnp.float32
    ) * alpha
    p = jax.nn.silu(qk) * (1.0 / scaling_seqlen)

    seq_lengths = (seq_offsets[1:] - seq_offsets[:-1]).astype(jnp.int32)
    col_ids = jnp.arange(N, dtype=jnp.int32)[None, None, :]
    row_ids = (
        delta_x_offsets.astype(jnp.int32).reshape(B, -1)
        - seq_offsets[:-1].astype(jnp.int32)[:, None]
    )[:, :, None]
    valid = col_ids == row_ids
    if num_targets is not None:
        sl = seq_lengths.reshape(B, 1, 1)
        nt = num_targets.astype(jnp.int32).reshape(B, 1, 1)
        row_ids = jnp.minimum(row_ids, sl - nt)
        col_ids = jnp.minimum(jnp.broadcast_to(col_ids, valid.shape), sl - nt)
    dist = row_ids - col_ids
    valid = jnp.logical_or(valid, dist > 0)
    if max_attn_len > 0:
        valid = jnp.logical_and(valid, dist <= max_attn_len)
    p = p * valid[:, None, :, :].astype(p.dtype)
    out = jnp.einsum(
        "bhxy,bhyv->bhxv", p.astype(fv.dtype), fv,
        preferred_element_type=jnp.float32,
    )
    return out.transpose(0, 2, 1, 3).reshape(L, H, V).astype(v.dtype)
