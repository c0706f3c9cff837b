"""Jagged <-> dense conversions and jagged concat/split, static-shape jnp.

TPU-native replacements for the reference's fbgemm jagged ops and the custom
CUDA/Triton jagged kernels (reference: examples/commons/ops/cuda_ops/csrc/
jagged_tensor_op_cuda.cpp, examples/commons/ops/triton_ops/triton_jagged.py).

Every op here keeps static shapes: padded buffers + lengths/offsets + masks.
They are pure gathers/scatters, which XLA lays out efficiently on TPU; the
attention hot path uses Pallas kernels instead (see ops/pallas/).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def lengths_to_offsets(lengths: jax.Array) -> jax.Array:
    return jnp.concatenate(
        [jnp.zeros((1,), lengths.dtype), jnp.cumsum(lengths)], axis=0
    )


def row_to_batch(offsets: jax.Array, total_len: int) -> jax.Array:
    """For each flat row t in [0, total_len), the batch index owning it.

    Rows beyond offsets[-1] map to B-1 (padding; callers mask separately).
    """
    t = jnp.arange(total_len, dtype=offsets.dtype)
    # searchsorted(right) - 1: offsets are nondecreasing.
    b = jnp.searchsorted(offsets, t, side="right") - 1
    return jnp.clip(b, 0, offsets.shape[0] - 2)


def jagged_to_padded_dense(
    values: jax.Array,
    offsets: jax.Array,
    max_len: int,
    padding_value: float = 0.0,
) -> jax.Array:
    """[T, D] jagged -> [B, N, D] padded dense."""
    B = offsets.shape[0] - 1
    pos = jnp.arange(max_len, dtype=offsets.dtype)
    idx = offsets[:-1, None] + pos[None, :]  # [B, N]
    valid = pos[None, :] < (offsets[1:] - offsets[:-1])[:, None]
    idx = jnp.clip(idx, 0, values.shape[0] - 1)
    out = values[idx]  # [B, N, D]
    if values.ndim == 1:
        return jnp.where(valid, out, padding_value)
    return jnp.where(valid[..., None], out, padding_value)


def padded_dense_to_jagged(
    dense: jax.Array,
    offsets: jax.Array,
    total_len: int,
) -> jax.Array:
    """[B, N, D] -> [T, D] jagged (rows past offsets[-1] are zero)."""
    N = dense.shape[1]
    b = row_to_batch(offsets, total_len)
    pos = jnp.arange(total_len, dtype=offsets.dtype) - offsets[b]
    valid = (jnp.arange(total_len, dtype=offsets.dtype) < offsets[-1]) & (pos < N)
    pos = jnp.clip(pos, 0, N - 1)
    out = dense[b, pos]
    if dense.ndim == 2:
        return jnp.where(valid, out, 0)
    return jnp.where(valid[..., None], out, 0)


def concat_2D_jagged(
    values_a: jax.Array,
    offsets_a: jax.Array,
    values_b: jax.Array,
    offsets_b: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Per-sample concat of two jagged buffers: out_i = a_i ++ b_i.

    Returns (values [Ta+Tb, D], offsets [B+1]).
    Mirrors reference `concat_2D_jagged` / `jagged_2D_tensor_concat`.
    """
    total = values_a.shape[0] + values_b.shape[0]
    len_a = offsets_a[1:] - offsets_a[:-1]
    len_b = offsets_b[1:] - offsets_b[:-1]
    offsets_c = lengths_to_offsets(len_a + len_b)
    b_idx = row_to_batch(offsets_c, total)
    pos = jnp.arange(total, dtype=offsets_c.dtype) - offsets_c[b_idx]
    from_a = pos < len_a[b_idx]
    idx_a = jnp.clip(offsets_a[b_idx] + pos, 0, values_a.shape[0] - 1)
    idx_b = jnp.clip(offsets_b[b_idx] + pos - len_a[b_idx], 0, values_b.shape[0] - 1)
    rows_valid = jnp.arange(total, dtype=offsets_c.dtype) < offsets_c[-1]
    ga = values_a[idx_a]
    gb = values_b[idx_b]
    sel = from_a if values_a.ndim == 1 else from_a[:, None]
    vmask = rows_valid if values_a.ndim == 1 else rows_valid[:, None]
    out = jnp.where(sel, ga, gb) * vmask.astype(values_a.dtype)
    return out, offsets_c


def concat_multi_2D_jagged(
    values_list: Sequence[jax.Array],
    offsets_list: Sequence[jax.Array],
) -> Tuple[jax.Array, jax.Array]:
    """Left-fold of concat_2D_jagged over several jagged buffers."""
    v, o = values_list[0], offsets_list[0]
    for vv, oo in zip(values_list[1:], offsets_list[1:]):
        v, o = concat_2D_jagged(v, o, vv, oo)
    return v, o


def split_2D_jagged(
    values: jax.Array,
    offsets: jax.Array,
    len_a: jax.Array,
    total_a: int,
    total_b: int,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Inverse of concat_2D_jagged: per-sample split at len_a[i].

    total_a/total_b are the static buffer sizes of the two outputs.
    Returns (values_a, offsets_a, values_b, offsets_b).
    """
    # batch leaves may be host numpy constants (thread-safe producers);
    # numpy fancy-indexing with a traced index would fail below
    len_a = jnp.asarray(len_a)
    offsets = jnp.asarray(offsets)
    len_c = offsets[1:] - offsets[:-1]
    len_b = len_c - len_a
    offsets_a = lengths_to_offsets(len_a)
    offsets_b = lengths_to_offsets(len_b)

    def gather_part(part_offsets, part_total, extra):
        b = row_to_batch(part_offsets, part_total)
        pos = jnp.arange(part_total, dtype=offsets.dtype) - part_offsets[b]
        src = jnp.clip(offsets[b] + extra(b) + pos, 0, values.shape[0] - 1)
        valid = jnp.arange(part_total, dtype=offsets.dtype) < part_offsets[-1]
        out = values[src]
        m = valid if values.ndim == 1 else valid[:, None]
        return out * m.astype(values.dtype)

    va = gather_part(offsets_a, total_a, lambda b: 0)
    vb = gather_part(offsets_b, total_b, lambda b: len_a[b])
    return va, offsets_a, vb, offsets_b


def interleave_jagged(
    values_a: jax.Array, values_b: jax.Array
) -> jax.Array:
    """Row-interleave two equal-shape jagged buffers: [a0,b0,a1,b1,...].

    Used to interleave item/action embeddings (reference:
    examples/hstu/modules/hstu_processor.py:91-104). Lengths double.
    """
    T, D = values_a.shape
    return jnp.stack([values_a, values_b], axis=1).reshape(2 * T, D)


def jagged_dense_bmm_broadcast_add(
    values: jax.Array,
    offsets: jax.Array,
    dense: jax.Array,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-sample jagged @ dense[b] + bias[b] (reference: triton_jagged.py:77).

    values [T, K], dense [B, K, N], bias [B, N] or None -> [T, N].
    """
    b = row_to_batch(offsets, values.shape[0])
    out = jnp.einsum(
        "tk,tkn->tn", values, dense[b], preferred_element_type=jnp.float32
    ).astype(values.dtype)
    if bias is not None:
        out = out + bias[b]
    total = offsets[-1]
    mask = jnp.arange(values.shape[0], dtype=offsets.dtype) < total
    return out * mask[:, None].astype(out.dtype)


def jagged_reduce_sum(values: jax.Array, offsets: jax.Array, num_segments: int) -> jax.Array:
    """Per-sample sum of jagged rows -> [B, D] (reference: triton_jagged.py:441)."""
    b = row_to_batch(offsets, values.shape[0])
    total = offsets[-1]
    mask = jnp.arange(values.shape[0], dtype=offsets.dtype) < total
    masked = values * mask[:, None].astype(values.dtype)
    return jax.ops.segment_sum(masked, b, num_segments=num_segments)
