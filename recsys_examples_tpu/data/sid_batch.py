"""SID-GR batch container + synthetic generator.

Counterpart of the reference's GPTSIDBatch / sid_sequence_dataset
(examples/commons/datasets/sid_sequence_dataset.py). History is a flattened
stream of item SIDs (num_hierarchies tokens per item); the candidate is the
next item's SID tuple.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class SIDBatch:
    history_sids: jax.Array     # [cap] int32 flattened (items * H)
    history_lengths: jax.Array  # [B] int32 (in tokens, multiple of H)
    history_offsets: jax.Array  # [B+1]
    candidate_sids: jax.Array   # [B, H] int32
    batch_size: int = struct.field(pytree_node=False)
    num_hierarchies: int = struct.field(pytree_node=False)
    max_history_tokens: int = struct.field(pytree_node=False)


def random_sid_batch(
    seed: int,
    batch_size: int,
    max_history_items: int,
    num_hierarchies: int,
    codebook_size: int,
) -> SIDBatch:
    rng = np.random.default_rng(seed)
    n_items = rng.integers(1, max_history_items + 1, size=(batch_size,))
    lengths = (n_items * num_hierarchies).astype(np.int32)
    cap = batch_size * max_history_items * num_hierarchies
    total = int(lengths.sum())
    sids = np.zeros((cap,), np.int32)
    sids[:total] = rng.integers(0, codebook_size, size=(total,))
    offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
    cand = rng.integers(
        0, codebook_size, size=(batch_size, num_hierarchies)
    ).astype(np.int32)
    return SIDBatch(
        history_sids=jnp.asarray(sids),
        history_lengths=jnp.asarray(lengths),
        history_offsets=jnp.asarray(offsets),
        candidate_sids=jnp.asarray(cand),
        batch_size=batch_size,
        num_hierarchies=num_hierarchies,
        max_history_tokens=max_history_items * num_hierarchies,
    )


def make_sid_mapping(
    num_items: int, num_hierarchies: int, codebook_size: int, seed: int = 0
) -> np.ndarray:
    """PID -> SID tuple mapping table [num_items, H]
    (reference: on-the-fly PID->SID map, gpt_model.py `sid_mapping`)."""
    rng = np.random.default_rng(seed)
    return rng.integers(
        0, codebook_size, size=(num_items, num_hierarchies)
    ).astype(np.int32)
