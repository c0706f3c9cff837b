"""Fused sparse optimizers over flat-table value rows.

Counterpart of the reference's in-place row optimizers
(corelib/dynamicemb/dynamicemb/optimizer.py:119-513; kernels
src/optimizer.cu `*_update_for_flat_table`): each hash-table value row is
[embedding ++ optimizer state], so a sparse update touches only the looked-up
rows — a gather, a fused VPU update, a scatter. No dense optimizer state.

Row layouts:
  sgd:              [dim]
  adam:             [dim | m(dim) | v(dim)]
  adagrad:          [dim | acc(dim)]
  rowwise_adagrad:  [dim | acc(1)]
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from recsys_examples_tpu.dynamicemb.hashtable import HashTableState


@dataclasses.dataclass(frozen=True)
class SparseOptimizerArgs:
    optimizer: str = "adam"   # sgd | adam | adagrad | rowwise_adagrad
    learning_rate: float = 1e-3
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 0.0
    initial_accumulator: float = 0.0


def value_dim_for(optimizer: str, dim: int) -> int:
    if optimizer == "sgd":
        return dim
    if optimizer == "adam":
        return 3 * dim
    if optimizer == "adagrad":
        return 2 * dim
    if optimizer == "rowwise_adagrad":
        return dim + 1
    raise ValueError(optimizer)


def initial_row(optimizer: str, emb: jax.Array, args: SparseOptimizerArgs):
    """Build full value rows [n, value_dim] from fresh embeddings [n, dim]."""
    n, dim = emb.shape
    if optimizer == "sgd":
        return emb
    if optimizer == "adam":
        return jnp.concatenate([emb, jnp.zeros((n, 2 * dim), emb.dtype)], axis=1)
    if optimizer == "adagrad":
        acc = jnp.full((n, dim), args.initial_accumulator, emb.dtype)
        return jnp.concatenate([emb, acc], axis=1)
    if optimizer == "rowwise_adagrad":
        acc = jnp.full((n, 1), args.initial_accumulator, emb.dtype)
        return jnp.concatenate([emb, acc], axis=1)
    raise ValueError(optimizer)


def sparse_update(
    state: HashTableState,
    slots: jax.Array,    # [u] int32 (-1 = skip)
    grads: jax.Array,    # [u, dim] fp32
    args: SparseOptimizerArgs,
    step: jax.Array,     # [] int32 global step (adam bias correction)
) -> HashTableState:
    """Apply the fused optimizer to the rows at `slots`."""
    dim = grads.shape[1]
    ok = slots >= 0
    safe = jnp.clip(slots, 0, state.capacity - 1)
    rows = state.values[safe].astype(jnp.float32)  # [u, value_dim]
    g = grads.astype(jnp.float32)
    if args.weight_decay > 0.0:
        g = g + args.weight_decay * rows[:, :dim]
    lr = args.learning_rate

    if args.optimizer == "sgd":
        new_rows = rows[:, :dim] - lr * g
    elif args.optimizer == "adam":
        w, m, v = rows[:, :dim], rows[:, dim:2 * dim], rows[:, 2 * dim:]
        m = args.beta1 * m + (1 - args.beta1) * g
        v = args.beta2 * v + (1 - args.beta2) * g * g
        t = jnp.maximum(step, 1).astype(jnp.float32)
        mhat = m / (1 - args.beta1 ** t)
        vhat = v / (1 - args.beta2 ** t)
        w = w - lr * mhat / (jnp.sqrt(vhat) + args.eps)
        new_rows = jnp.concatenate([w, m, v], axis=1)
    elif args.optimizer == "adagrad":
        w, acc = rows[:, :dim], rows[:, dim:]
        acc = acc + g * g
        w = w - lr * g / (jnp.sqrt(acc) + args.eps)
        new_rows = jnp.concatenate([w, acc], axis=1)
    elif args.optimizer == "rowwise_adagrad":
        w, acc = rows[:, :dim], rows[:, dim:]
        acc = acc + jnp.mean(g * g, axis=1, keepdims=True)
        w = w - lr * g / (jnp.sqrt(acc) + args.eps)
        new_rows = jnp.concatenate([w, acc], axis=1)
    else:
        raise ValueError(args.optimizer)

    new_rows = new_rows.astype(state.values.dtype)
    tgt = jnp.where(ok, slots, state.capacity)  # failed slots dropped
    return state.replace(
        values=state.values.at[tgt].set(new_rows, mode="drop")
    )
