"""Frozen (inference) dynamic tables + training->inference conversion.

Counterpart of the reference's exportable tables
(corelib/dynamicemb/dynamicemb/exportable_tables.py:104
`InferenceLinearBucketTable`, :192 `InferenceEmbeddingCollection`;
twin-module conversion construct_twin_module.py:197).

An inference table is the training table with optimizer-state columns
stripped and mutation removed: pure lookup (missing -> zeros). It can be
serialized with jax.export for a deployment artifact (the TPU analogue of
torch.export/AOTI).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from recsys_examples_tpu.dynamicemb.batched_table import (
    DynamicEmbeddingTable,
    DynamicEmbTableState,
)
from recsys_examples_tpu.dynamicemb.dynamicemb_config import EMPTY_KEY, hash_keys


@struct.dataclass
class InferenceTableState:
    keys: jax.Array     # [num_buckets, C] int64
    values: jax.Array   # [num_buckets * C, dim] embedding columns only

    @property
    def bucket_capacity(self):
        return self.keys.shape[1]

    @property
    def num_buckets(self):
        return self.keys.shape[0]


def freeze_table(
    table: DynamicEmbeddingTable, state: DynamicEmbTableState
) -> InferenceTableState:
    """Strip optimizer state; keep embedding columns
    (reference: twin-module training->inference conversion)."""
    return InferenceTableState(
        keys=state.table.keys,
        values=state.table.values,
    )


def inference_lookup(
    state: InferenceTableState, keys: jax.Array
) -> jax.Array:
    """Pure lookup: [n] ids -> [n, dim]; missing/padded -> zeros
    (reference: InferenceLinearBucketTable.forward)."""
    C = state.bucket_capacity
    b = hash_keys(keys, state.num_buckets)
    bucket_keys = state.keys[b]
    match = (bucket_keys == keys[:, None]) & (keys[:, None] != EMPTY_KEY)
    found = jnp.any(match, axis=1)
    slot = b * C + jnp.argmax(match, axis=1).astype(jnp.int32)
    emb = state.values[jnp.where(found, slot, 0)]
    return jnp.where(found[:, None], emb, jnp.zeros((), emb.dtype))


def export_serialized(
    state: InferenceTableState, sample_n: int = 1024
) -> bytes:
    """Serialize the lookup as a portable jax.export artifact
    (TPU analogue of the reference's torch.export/AOTI packaging,
    examples/hstu/inference_aoti/)."""
    from jax import export as jexport

    def fn(keys):
        return inference_lookup(state, keys)

    exported = jexport.export(jax.jit(fn))(
        jax.ShapeDtypeStruct((sample_n,), jnp.int64)
    )
    return exported.serialize()
