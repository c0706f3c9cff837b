"""Static embedding collections (data-parallel / replicated tables).

Counterpart of the reference's `DataParallelEmbeddingCollection` /
`ShardedEmbedding` facade (examples/commons/modules/embedding.py:165,350).
Dynamic (hash-mapped, evicting) tables live in dynamicemb/ and plug into the
same feature->values dict contract.

Lookup is a plain gather — XLA lays out embedding gathers efficiently on
TPU; model-parallel sharding of large tables is handled by the dynamicemb
planner + all-to-all exchange, not here.
"""
from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from recsys_examples_tpu.data.hstu_batch import HSTUBatch
from recsys_examples_tpu.modules.config import EmbeddingConfig


class EmbeddingCollection(nn.Module):
    """Groups tables; returns feature -> jagged embedding values [cap, dim]."""

    configs: Tuple[EmbeddingConfig, ...]

    @nn.compact
    def __call__(self, batch: HSTUBatch) -> Dict[str, jax.Array]:
        out: Dict[str, jax.Array] = {}
        for cfg in self.configs:
            table = self.param(
                f"{cfg.table_name}_weight",
                nn.initializers.normal(stddev=1.0 / (cfg.vocab_size ** 0.5)),
                (cfg.vocab_size, cfg.dim),
            )
            for feat in cfg.feature_names:
                ids = batch.features[feat]
                idx = jnp.clip(ids.values.astype(jnp.int32), 0, cfg.vocab_size - 1)
                emb = table[idx]
                total = ids.offsets[-1]
                valid = (
                    jnp.arange(ids.values.shape[0], dtype=jnp.int32) < total
                )[:, None]
                out[feat] = jnp.where(valid, emb, jnp.zeros((), emb.dtype))
        return out
