"""Fused sparse optimizers over hash-table rows.

Counterpart of the reference's in-place row optimizers
(corelib/dynamicemb/dynamicemb/optimizer.py:119-513; kernels
src/optimizer.cu `*_update_for_flat_table`): a sparse update touches only
the looked-up rows — a gather, a fused VPU update, a scatter. No dense
optimizer state.

Layout: embeddings live in `HashTableState.values` [cap, dim] and the
optimizer state in the separate `HashTableState.opt` [cap, opt_dim]
(the reference packs both into one flat row; on TPU an odd combined row
width like dim+1 makes XLA choose a transposed layout for the multi-GB
values buffer and insert two full-table layout-conversion copies per
training step, so the state is split into two lane-aligned arrays).

opt_dim per optimizer:
  sgd:              0
  adam:             2*dim   (m ++ v)
  adagrad:          dim     (acc)
  rowwise_adagrad:  1       (row acc)
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

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


def opt_dim_for(optimizer: str, dim: int) -> int:
    if optimizer == "sgd":
        return 0
    if optimizer == "adam":
        return 2 * dim
    if optimizer == "adagrad":
        return dim
    if optimizer == "rowwise_adagrad":
        return 1
    raise ValueError(optimizer)


def value_dim_for(optimizer: str, dim: int) -> int:
    """Total floats stored per row (embedding + optimizer state) — used for
    memory accounting (reference: get_table_value_bytes,
    dynamicemb_config.py:768)."""
    return dim + opt_dim_for(optimizer, dim)


def initial_opt_row(
    optimizer: str, n: int, dim: int, args: SparseOptimizerArgs, dtype
) -> Optional[jax.Array]:
    """Initial optimizer-state rows [n, opt_dim] for fresh keys."""
    od = opt_dim_for(optimizer, dim)
    if od == 0:
        return None
    if optimizer in ("adagrad", "rowwise_adagrad"):
        return jnp.full((n, od), args.initial_accumulator, dtype)
    return jnp.zeros((n, od), dtype)


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
    w = state.values[safe].astype(jnp.float32)  # [u, dim]
    g = grads.astype(jnp.float32)
    if args.weight_decay > 0.0:
        g = g + args.weight_decay * w
    lr = args.learning_rate
    new_opt_rows = None

    if args.optimizer == "sgd":
        w = w - lr * g
    elif args.optimizer == "adam":
        o = state.opt[safe].astype(jnp.float32)
        m, v = o[:, :dim], o[:, dim:]
        m = args.beta1 * m + (1 - args.beta1) * g
        v = args.beta2 * v + (1 - args.beta2) * g * g
        t = jnp.maximum(step, 1).astype(jnp.float32)
        mhat = m / (1 - args.beta1 ** t)
        vhat = v / (1 - args.beta2 ** t)
        w = w - lr * mhat / (jnp.sqrt(vhat) + args.eps)
        new_opt_rows = jnp.concatenate([m, v], axis=1)
    elif args.optimizer == "adagrad":
        acc = state.opt[safe].astype(jnp.float32)
        acc = acc + g * g
        w = w - lr * g / (jnp.sqrt(acc) + args.eps)
        new_opt_rows = acc
    elif args.optimizer == "rowwise_adagrad":
        acc = state.opt[safe].astype(jnp.float32)
        acc = acc + jnp.mean(g * g, axis=1, keepdims=True)
        w = w - lr * g / (jnp.sqrt(acc) + args.eps)
        new_opt_rows = acc
    else:
        raise ValueError(args.optimizer)

    # distinct OOB sentinels for failed slots keep the unique_indices
    # contract (slots of successful rows are unique: deduped keys)
    lane = jnp.arange(slots.shape[0], dtype=slots.dtype)
    tgt = jnp.where(ok, slots, state.capacity + lane)
    new_values = state.values.at[tgt].set(
        w.astype(state.values.dtype), mode="drop", unique_indices=True
    )
    new_opt = state.opt
    if new_opt_rows is not None:
        new_opt = state.opt.at[tgt].set(
            new_opt_rows.astype(state.opt.dtype), mode="drop",
            unique_indices=True,
        )
    return state.replace(values=new_values, opt=new_opt)
