"""RankingGR: embedding collection -> HSTU block -> MLP head -> multi-task
loss (reference: examples/hstu/model/ranking_gr.py:34).
"""
from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from recsys_examples_tpu.data.hstu_batch import HSTUBatch
from recsys_examples_tpu.jagged.jagged_tensor import JaggedData
from recsys_examples_tpu.modules.config import HSTUConfig, RankingConfig
from recsys_examples_tpu.modules.embedding import EmbeddingCollection
from recsys_examples_tpu.modules.hstu_block import HSTUBlock
from recsys_examples_tpu.modules.losses import (
    cross_entropy_loss,
    multi_task_bce_loss,
)
from recsys_examples_tpu.modules.mlp import MLP


class RankingGR(nn.Module):
    hstu_config: HSTUConfig
    task_config: RankingConfig

    def setup(self):
        self.embeddings = EmbeddingCollection(self.task_config.embedding_configs)
        self.hstu_block = HSTUBlock(self.hstu_config)
        self.head = MLP(
            self.task_config.prediction_head_arch,
            activation=self.task_config.prediction_head_act_type,
            use_bias=self.task_config.prediction_head_bias,
            dtype=self.hstu_config.dtype,
        )

    def get_logits(
        self, batch: HSTUBatch, train: bool = True, embeddings=None
    ) -> Tuple[jax.Array, JaggedData]:
        """`embeddings` overrides/extends the static tables with precomputed
        per-token values (the dynamic-embedding path feeds them in)."""
        emb = dict(self.embeddings(batch))
        if embeddings:
            emb.update(embeddings)
        jd = self.hstu_block(emb, batch, train)
        logits = self.head(jd.values).astype(jnp.float32)
        return logits, jd

    def __call__(
        self, batch: HSTUBatch, train: bool = True, embeddings=None
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """Returns (scalar mean loss, aux dict with logits/labels/valid)."""
        from recsys_examples_tpu.data.hstu_batch import as_device_batch

        batch = as_device_batch(batch)
        logits, jd = self.get_logits(batch, train, embeddings)
        valid = (
            jnp.arange(logits.shape[0], dtype=jnp.int32)
            < jd.seqlen_offsets[-1]
        )
        # logits are candidate-JAGGED-packed (row r = sample b's j-th
        # candidate, offsets jd.seqlen_offsets); batch.labels is b-major
        # strided [b * max_num_candidates + j]. Repack labels to match —
        # indexing batch.labels[:N] directly would pair the wrong labels
        # whenever any sample has fewer than max_num_candidates.
        if batch.max_num_candidates > 0:
            from recsys_examples_tpu.ops.jagged import row_to_batch

            N = logits.shape[0]
            offs = jd.seqlen_offsets
            b = row_to_batch(offs, N)
            j = jnp.arange(N, dtype=jnp.int32) - offs[b]
            src = jnp.clip(
                b * batch.max_num_candidates + j,
                0, batch.labels.shape[0] - 1,
            )
            labels = batch.labels[src]
        else:
            labels = batch.labels[: logits.shape[0]]
        nt = self.task_config.num_tasks
        nc = self.task_config.prediction_head_arch[-1]
        if nc == nt:
            loss_sum, count = multi_task_bce_loss(logits, labels, valid, nt)
            loss = loss_sum.sum() / jnp.maximum(count * nt, 1.0)
        else:
            loss_sum, count = cross_entropy_loss(logits, labels, valid)
            loss = loss_sum / jnp.maximum(count, 1.0)
        return loss, {
            "logits": logits,
            "labels": labels,
            "valid": valid,
            "loss": loss,
        }
