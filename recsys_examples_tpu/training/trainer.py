"""GR trainer: fused sparse(dynamic-embedding) + dense train step.

Plays the role of the reference's sharded trainer stack
(examples/commons/distributed/sharding.py:270 `make_optimizer_and_shard` +
examples/hstu/training/trainer/training.py:142 `train_with_pipeline`):

  one jitted step =
    phase A  sparse forward  (shard_map a2a exchange, non-diff)
    phase B  dense fwd/bwd   (autodiff; grads flow to the per-token
                              embedding tensors returned by phase A)
    phase C  sparse backward (route grads to owners, fused row optimizer)
    dense optimizer update   (optax)

The pipeline overlap the reference builds manually with CUDA streams
(train_pipeline.py) falls out of XLA async dispatch + host-side double
buffering of the input iterator.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct

from recsys_examples_tpu.data.hstu_batch import HSTUBatch
from recsys_examples_tpu.dynamicemb.sharded_collection import (
    ShardedDynamicEmbedding,
)


@struct.dataclass
class GRTrainState:
    params: Any
    opt_state: Any
    sparse: Dict[str, Any]   # feature name -> DynamicEmbTableState
    step: jax.Array


class GRTrainer:
    """Builds init/train_step/eval_step closures for a GR model.

    sparse_tables: feature name -> ShardedDynamicEmbedding for dynamic
    (hash) tables; features not listed use the model's static tables.
    """

    def __init__(
        self,
        model: nn.Module,
        tx: optax.GradientTransformation,
        sparse_tables: Optional[Dict[str, ShardedDynamicEmbedding]] = None,
    ):
        self.model = model
        self.tx = tx
        self.sparse_tables = sparse_tables or {}

    def init(self, rng: jax.Array, batch: HSTUBatch) -> GRTrainState:
        sparse = {
            name: tbl.init_state() for name, tbl in self.sparse_tables.items()
        }
        emb0 = self._sparse_fwd_dryrun(sparse, batch)
        params = self.model.init(
            {"params": rng, "dropout": rng}, batch, train=False,
            embeddings=emb0,
        )["params"]
        return GRTrainState(
            params=params,
            opt_state=self.tx.init(params),
            sparse=sparse,
            step=jnp.zeros((), jnp.int32),
        )

    def _sparse_fwd_dryrun(self, sparse, batch):
        emb = {}
        for name, tbl in self.sparse_tables.items():
            ids = batch.features[name].values
            _, e, _ = tbl.forward(sparse[name], ids, train=False)
            emb[name] = e
        return emb or None

    def train_step(
        self, state: GRTrainState, batch: HSTUBatch, dropout_rng: jax.Array
    ) -> Tuple[GRTrainState, Dict[str, jax.Array]]:
        rng = jax.random.fold_in(dropout_rng, state.step)

        # ---- phase A: sparse forward (non-diff)
        sparse = dict(state.sparse)
        emb: Dict[str, jax.Array] = {}
        residuals = {}
        for name, tbl in self.sparse_tables.items():
            ids = batch.features[name].values
            sparse[name], e, res = tbl.forward(sparse[name], ids, train=True)
            emb[name] = e
            residuals[name] = res

        # ---- phase B: dense fwd/bwd
        def loss_fn(params, emb_dict):
            loss, aux = self.model.apply(
                {"params": params}, batch, train=True,
                embeddings=emb_dict or None, rngs={"dropout": rng},
            )
            return loss, aux

        (loss, aux), (gparams, gemb) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params, emb)

        updates, new_opt = self.tx.update(
            gparams, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)

        # ---- phase C: sparse backward (fused row optimizer)
        for name, tbl in self.sparse_tables.items():
            sparse[name] = tbl.backward(
                sparse[name], residuals[name], gemb[name]
            )

        # a2a bucket overflow tripwire: uniques past their owner bucket's
        # cap trained on transient-init embeddings this step (grads
        # dropped). Surfaced so entries can log it and AdaptiveBucketing
        # can grow the cap — overflow must never be silent.
        emb_overflow = sum(
            (jnp.sum(r.num_overflow) for r in residuals.values()),
            jnp.zeros((), jnp.int32),
        )

        new_state = GRTrainState(
            params=new_params,
            opt_state=new_opt,
            sparse=sparse,
            step=state.step + 1,
        )
        return new_state, {"loss": loss, "emb_overflow": emb_overflow}

    def eval_step(self, state: GRTrainState, batch: HSTUBatch):
        emb = {}
        for name, tbl in self.sparse_tables.items():
            ids = batch.features[name].values
            _, e, _ = tbl.forward(state.sparse[name], ids, train=False)
            emb[name] = e
        loss, aux = self.model.apply(
            {"params": state.params}, batch, train=False,
            embeddings=emb or None,
        )
        return loss, aux
