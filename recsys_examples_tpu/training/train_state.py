"""Train state + step functions for the GR models.

The reference composes TorchRec DMP + Megatron DDP + fused optimizers
(examples/commons/distributed/sharding.py:270 `make_optimizer_and_shard`);
here the dense path is a single jitted train step over a pjit mesh —
gradient sync, TP sharding, and mixed precision all fall out of GSPMD +
parameter partitioning annotations.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array

    @staticmethod
    def create(params, tx):
        return TrainState(
            params=params,
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )


def make_optimizer(
    lr: float = 1e-3,
    optimizer: str = "adam",
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    if optimizer == "adam":
        tx = optax.adam(lr, b1=beta1, b2=beta2, eps=eps)
    elif optimizer == "adamw":
        tx = optax.adamw(lr, b1=beta1, b2=beta2, eps=eps,
                         weight_decay=weight_decay)
    elif optimizer == "sgd":
        tx = optax.sgd(lr)
    elif optimizer == "adagrad":
        tx = optax.adagrad(lr, eps=eps)
    else:
        raise ValueError(f"unknown optimizer {optimizer}")
    return tx


def make_train_step(
    model: nn.Module,
    tx: optax.GradientTransformation,
) -> Callable:
    """Returns train_step(state, batch, dropout_rng) -> (state, metrics)."""

    def train_step(state: TrainState, batch, dropout_rng):
        rng = jax.random.fold_in(dropout_rng, state.step)

        def loss_fn(params):
            loss, aux = model.apply(
                {"params": params}, batch, train=True,
                rngs={"dropout": rng},
            )
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params, opt_state=new_opt, step=state.step + 1
        )
        return new_state, {"loss": loss, **{
            k: v for k, v in aux.items() if k in ("loss",)
        }}

    return train_step


def make_eval_step(model: nn.Module) -> Callable:
    def eval_step(state: TrainState, batch):
        loss, aux = model.apply({"params": state.params}, batch, train=False)
        return aux

    return eval_step
