"""RetrievalGR: HSTU encoder + in-batch-negative sampled softmax
(reference: examples/hstu/model/retrieval_gr.py:35,
modules/negatives_sampler.py:59 `InBatchNegativesSampler`,
modules/sampled_softmax_loss.py:58).

Training pairs: for every history position i (after de-interleave), the
query is the HSTU output at i and the supervision item is the *next* item
(i+1) in the same sequence; the last position has no target.
"""
from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from recsys_examples_tpu.data.hstu_batch import HSTUBatch
from recsys_examples_tpu.modules.config import HSTUConfig, RetrievalConfig
from recsys_examples_tpu.modules.embedding import EmbeddingCollection
from recsys_examples_tpu.modules.hstu_block import HSTUBlock
from recsys_examples_tpu.modules.losses import in_batch_sampled_softmax_loss
from recsys_examples_tpu.ops.jagged import row_to_batch


class RetrievalGR(nn.Module):
    hstu_config: HSTUConfig
    task_config: RetrievalConfig

    def setup(self):
        self.embeddings = EmbeddingCollection(self.task_config.embedding_configs)
        self.hstu_block = HSTUBlock(self.hstu_config)

    def encode(self, batch: HSTUBatch, train: bool = True, embeddings=None):
        from recsys_examples_tpu.data.hstu_batch import as_device_batch

        batch = as_device_batch(batch)
        emb = dict(self.embeddings(batch))
        if embeddings:
            emb.update(embeddings)
        jd = self.hstu_block(emb, batch, train)
        return emb, jd

    def __call__(
        self, batch: HSTUBatch, train: bool = True, embeddings=None
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        emb, jd = self.encode(batch, train, embeddings)
        q = jd.values  # [Tq, D] L2-normalized user states
        Tq = q.shape[0]
        item = batch.features[batch.item_feature_name]
        item_emb = emb[batch.item_feature_name]  # [cap, D]

        # supervision: next item in the same sequence
        b = row_to_batch(jd.seqlen_offsets, Tq)
        pos = jnp.arange(Tq, dtype=jnp.int32) - jd.seqlen_offsets[b]
        # map back into the raw item feature layout
        src = item.offsets[b] + pos + 1
        has_next = (pos + 1) < (item.offsets[b + 1] - item.offsets[b])
        src = jnp.clip(src, 0, item.values.shape[0] - 1)
        target_emb = item_emb[src].astype(jnp.float32)
        eps = self.task_config.l2_norm_eps
        tnorm = jnp.sqrt(
            jnp.sum(target_emb * target_emb, axis=-1, keepdims=True) + eps * eps
        )
        target_emb = target_emb / tnorm
        target_ids = item.values[src]
        valid = (
            (jnp.arange(Tq, dtype=jnp.int32) < jd.seqlen_offsets[-1]) & has_next
        )
        loss_sum, count = in_batch_sampled_softmax_loss(
            q.astype(jnp.float32),
            target_emb,
            target_ids,
            valid,
            temperature=self.task_config.temperature,
        )
        loss = loss_sum / jnp.maximum(count, 1.0)
        return loss, {
            "query_emb": q,
            "target_emb": target_emb,
            "target_ids": target_ids,
            "valid": valid,
            "loss": loss,
        }
