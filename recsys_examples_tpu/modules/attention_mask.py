"""Attention mask builders for the SID decoder.

Counterpart of the reference mask zoo
(examples/sid_gr/model/attention_mask.py:19 padded causal w/ optional BOS,
:82 history+causal-target, :153 target-aware causal, :210+ dense-mask ->
interval ("arbitrary func") converters used by the flash-attn fork).

On TPU the decoder consumes dense [B, N, N] boolean masks directly (the
block-sparse interval encoding is a CUDA-flash-attn implementation detail);
the converters to/from interval form are provided for parity and tests.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def padded_causal_mask(lengths: jax.Array, N: int) -> jax.Array:
    """[B, N, N] causal within each sample's valid region."""
    pos = jnp.arange(N, dtype=jnp.int32)
    causal = pos[None, :, None] >= pos[None, None, :]
    valid_r = (pos[None, :] < lengths[:, None])[:, :, None]
    valid_c = (pos[None, :] < lengths[:, None])[:, None, :]
    return causal & valid_r & valid_c


def history_causal_target_mask(
    lengths: jax.Array, num_targets: jax.Array, N: int
) -> jax.Array:
    """History tokens: causal among themselves. Target tokens: attend all
    history + themselves, but NOT each other
    (reference: attention_mask.py:82)."""
    pos = jnp.arange(N, dtype=jnp.int32)
    hist_end = (lengths - num_targets)[:, None]
    is_tgt_r = (pos[None, :] >= hist_end)[:, :, None]
    is_tgt_c = (pos[None, :] >= hist_end)[:, None, :]
    causal = pos[None, :, None] >= pos[None, None, :]
    diag = (pos[:, None] == pos[None, :])[None]
    base = causal & ~is_tgt_c          # anyone -> history, causal
    tgt_self = is_tgt_r & diag          # target -> itself
    m = base | tgt_self
    valid_r = (pos[None, :] < lengths[:, None])[:, :, None]
    valid_c = (pos[None, :] < lengths[:, None])[:, None, :]
    return m & valid_r & valid_c


def target_aware_causal_mask(
    lengths: jax.Array, num_targets: jax.Array, N: int
) -> jax.Array:
    """Causal, but target positions are clamped to history end so targets
    see all history and never each other except themselves
    (reference: attention_mask.py:153)."""
    pos = jnp.arange(N, dtype=jnp.int32)[None, :]
    hist_end = (lengths - num_targets)[:, None]
    r = jnp.minimum(pos, hist_end)[:, :, None]
    c = jnp.minimum(pos, hist_end)[:, None, :]
    diag = (pos[0][:, None] == pos[0][None, :])[None]
    m = (r > c) | diag
    valid_r = (pos < lengths[:, None])[:, :, None]
    valid_c = (pos < lengths[:, None])[:, None, :]
    return m & valid_r & valid_c


def dense_mask_to_intervals(mask_row: jax.Array) -> jax.Array:
    """One mask row [N] bool -> start/end interval encoding [N+1] int32
    (the reference's `arbitrary_func` form, attention_mask.py:278):
    returns prefix-count array whose diffs are the mask. Used for parity
    checks with the reference's block-sparse encoding."""
    return jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(mask_row.astype(jnp.int32))]
    )


def intervals_to_dense_mask(intervals: jax.Array) -> jax.Array:
    return (intervals[1:] - intervals[:-1]) > 0
