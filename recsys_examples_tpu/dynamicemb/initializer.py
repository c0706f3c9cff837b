"""On-miss embedding initializers (reference:
corelib/dynamicemb/dynamicemb/initializer.py; device kernels
src/initializer.cu:193-209).

Initial values are generated on-device from the missed keys themselves
(key-seeded counter RNG) so initialization is deterministic w.r.t. the key —
the same key always initializes identically regardless of batch composition
or shard placement. This is stronger than the reference's curand path and
makes dump/load + resharding reproducible.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from recsys_examples_tpu.dynamicemb.dynamicemb_config import (
    DynamicEmbInitializerArgs,
    DynamicEmbInitializerMode,
)


def _key_bits(keys: jax.Array, dim: int, salt: int) -> jax.Array:
    """[n, dim] uint32 hash bits derived from (key, column, salt)."""
    k = keys.astype(jnp.uint64)[:, None]
    col = jnp.arange(dim, dtype=jnp.uint64)[None, :]
    x = k * jnp.uint64(0x9E3779B97F4A7C15) + col + jnp.uint64(salt)
    x = (x ^ (x >> jnp.uint64(30))) * jnp.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> jnp.uint64(27))) * jnp.uint64(0x94D049BB133111EB)
    x = x ^ (x >> jnp.uint64(31))
    return (x & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)


def _uniform01(bits: jax.Array) -> jax.Array:
    return bits.astype(jnp.float32) * (1.0 / 4294967296.0)


def initialize_embeddings(
    keys: jax.Array,   # [n] int64
    dim: int,
    args: DynamicEmbInitializerArgs,
    dtype=jnp.float32,
) -> jax.Array:
    """[n, dim] initial embedding values."""
    mode = args.mode
    if mode == DynamicEmbInitializerMode.CONSTANT:
        return jnp.full((keys.shape[0], dim), args.value, dtype)
    if mode == DynamicEmbInitializerMode.DEBUG:
        # deterministic pattern: (key % 100000) / 100000 broadcast per row
        v = (keys % 100000).astype(jnp.float32) / 100000.0
        return jnp.broadcast_to(v[:, None], (keys.shape[0], dim)).astype(dtype)
    if mode == DynamicEmbInitializerMode.UNIFORM:
        lo, hi = args.lower, args.upper
        if lo == 0.0 and hi == 0.0:
            # reference planner default: ±1/sqrt(dim)
            hi = 1.0 / (dim ** 0.5)
            lo = -hi
        u = _uniform01(_key_bits(keys, dim, 1))
        return (lo + (hi - lo) * u).astype(dtype)
    # normal / truncated normal via Box-Muller on two hash streams
    u1 = jnp.maximum(_uniform01(_key_bits(keys, dim, 2)), 1e-7)
    u2 = _uniform01(_key_bits(keys, dim, 3))
    z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)
    if mode == DynamicEmbInitializerMode.TRUNCATED_NORMAL:
        z = jnp.clip(z, -2.0, 2.0)
    return (args.mean + args.std_dev * z).astype(dtype)
