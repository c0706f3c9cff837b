"""Collective ops with correct gradients for shard_map code.

Counterpart of the reference's collective autograd wrappers
(examples/commons/ops/collective_ops.py:23-657: split/gather along
first/last dim, gatherv, jagged allgather) — in JAX these are thin wrappers
over lax collectives (whose transposes ARE the correct gradients), plus
jagged-aware variants that carry lengths.

All functions must be called inside shard_map with the given axis name.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def gather_along_first_dim(x: jax.Array, axis: str) -> jax.Array:
    """All-gather rows; grad = reduce-scatter (lax handles the transpose)."""
    return jax.lax.all_gather(x, axis, axis=0, tiled=True)


def gather_along_last_dim(x: jax.Array, axis: str) -> jax.Array:
    """TP gather of feature-sharded activations
    (reference: collective_ops.py gather_along_last_dim)."""
    return jax.lax.all_gather(x, axis, axis=x.ndim - 1, tiled=True)


def split_along_first_dim(x: jax.Array, axis: str) -> jax.Array:
    """Keep this rank's row block (SP scatter); grad = all-gather."""
    w = jax.lax.axis_size(axis)
    i = jax.lax.axis_index(axis)
    n = x.shape[0] // w
    return jax.lax.dynamic_slice_in_dim(x, i * n, n, axis=0)


def reduce_scatter_first_dim(x: jax.Array, axis: str) -> jax.Array:
    return jax.lax.psum_scatter(x, axis, scatter_dimension=0, tiled=True)


def all_reduce(x: jax.Array, axis: str) -> jax.Array:
    return jax.lax.psum(x, axis)


def jagged_allgather(
    values: jax.Array, lengths: jax.Array, axis: str
) -> Tuple[jax.Array, jax.Array]:
    """All-gather a jagged buffer: concatenates every rank's (fixed-capacity)
    values + lengths (reference: jagged_tensor_allgather
    collective_ops.py:497). Capacity-padded, so this is a plain tiled
    all-gather; consumers use the gathered lengths."""
    gv = jax.lax.all_gather(values, axis, axis=0, tiled=True)
    gl = jax.lax.all_gather(lengths, axis, axis=0, tiled=True)
    return gv, gl


def grad_scale(x: jax.Array, scale: float) -> jax.Array:
    """Identity forward, scaled gradient (reference:
    commons/ops/grad_scaling.py — used to fix TP-duplicated embedding
    grads)."""

    @jax.custom_vjp
    def f(x):
        return x

    def fwd(x):
        return x, None

    def bwd(_, g):
        return (g * scale,)

    f.defvjp(fwd, bwd)
    return f(x)
