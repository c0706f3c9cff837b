"""Segmented (multi-table) key dedup — sort-based, static-shape.

Counterpart of the reference's hash-based `segmented_unique_cuda`
(corelib/dynamicemb/src/unique_op.cu:797; contract doc src/unique_op.h:27-66):
given keys from several tables concatenated, produce unique keys per table,
reverse indices mapping each input to its unique slot, per-table offsets and
optional frequency counts.

TPU design: a single sort over the composite (table_id, key) is
MXU/VPU-friendly and deterministic; all outputs are fixed-capacity with an
EMPTY_KEY sentinel in unused slots (XLA static shapes). Everything after
the sort is gathers + vectorized binary searches — element scatters
serialize on the TPU scalar core (~70ns/element), so none are used.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from recsys_examples_tpu.dynamicemb.dynamicemb_config import EMPTY_KEY


def segmented_unique(
    keys: jax.Array,          # [n] int64 (EMPTY_KEY = padding, ignored)
    table_ids: Optional[jax.Array] = None,  # [n] int32, or None (single table)
    num_tables: int = 1,
    *,
    return_counts: bool = False,
):
    """Returns (unique_keys [n], reverse_idx [n], unique_table_ids [n],
    num_unique [], counts [n]?).

    unique_keys is padded with EMPTY_KEY past num_unique. Padding inputs map
    their reverse_idx to the slot of EMPTY_KEY's unique entry (which callers
    mask out — the embedding gather returns zeros for it).
    Unique entries are sorted by (table_id, key): deterministic, and
    per-table groups are contiguous (per-table offsets derivable by
    searchsorted).
    """
    n = keys.shape[0]
    if table_ids is None:
        table_ids = jnp.zeros((n,), jnp.int32)
    # composite sort key: EMPTY padding sorts last
    is_pad = keys == EMPTY_KEY
    tid = jnp.where(is_pad, num_tables, table_ids.astype(jnp.int32))
    order = jnp.lexsort((keys, tid))
    sk = keys[order]
    st = tid[order]
    prev_k = jnp.concatenate([sk[:1] - 1, sk[:-1]])
    prev_t = jnp.concatenate([st[:1] - 1, st[:-1]])
    first = (sk != prev_k) | (st != prev_t)
    uid_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1
    # num_unique = max uid among non-pad + 1
    pad_sorted = st == num_tables
    num_unique = jnp.where(
        jnp.any(~pad_sorted),
        jnp.max(jnp.where(pad_sorted, -1, uid_sorted)) + 1,
        0,
    )
    # Compact the group-start positions to the front with ONE extra sort:
    # the k-th first-flag position (ascending) is exactly unique id k's
    # start. (searchsorted(uid_sorted, arange) lowers to a per-element
    # binary-search loop — ~1.7 ms at 16k keys — and a scatter would
    # serialize on the scalar core; sorts are vectorized.)
    u_range = jnp.arange(n, dtype=jnp.int32)
    start_or_pad = jnp.where(first & ~pad_sorted, u_range, jnp.int32(n))
    first_pos = jnp.sort(start_or_pad)
    fp = jnp.clip(first_pos, 0, n - 1)
    group_valid = u_range <= jnp.max(uid_sorted)  # any group incl. padding
    key_valid = u_range < num_unique
    unique_keys = jnp.where(key_valid, sk[fp], EMPTY_KEY)
    unique_tids = jnp.where(key_valid, st[fp], 0)
    # reverse permutation of `order` without a scatter
    inv_order = jnp.argsort(order)
    reverse = uid_sorted[inv_order].astype(jnp.int32)
    if return_counts:
        next_pos = jnp.searchsorted(uid_sorted, u_range, side="right")
        counts = jnp.where(
            key_valid & group_valid,
            (next_pos - first_pos).astype(jnp.int32),
            0,
        )
        return unique_keys, reverse, unique_tids, num_unique, counts
    return unique_keys, reverse, unique_tids, num_unique


def table_offsets_from_unique(
    unique_tids: jax.Array, num_unique: jax.Array, num_tables: int
) -> jax.Array:
    """[num_tables+1] offsets of each table's unique-key group.

    unique_tids[:num_unique] is sorted by table id (the sort is over
    (table_id, key)), so offsets come from a vectorized binary search."""
    n = unique_tids.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    ut = jnp.where(pos < num_unique, unique_tids, num_tables)
    return jnp.searchsorted(
        ut, jnp.arange(num_tables + 1, dtype=unique_tids.dtype), side="left"
    ).astype(jnp.int32)
