"""recsys_examples_tpu — TPU-native generative recommender framework.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of
NVIDIA/recsys-examples: dynamic (hash-mapped) embeddings with
admission/eviction, HSTU ranking/retrieval training, SID-GR training and
large-beam serving — designed TPU-first (SPMD meshes, functional state,
static shapes, Pallas kernels on the hot path).
"""

import sys as _sys

import jax as _jax

# deep flax-module + Pallas trace stacks (8 HSTU layers x kernel tracing)
# exceed CPython's default 1000-frame limit
_sys.setrecursionlimit(max(_sys.getrecursionlimit(), 100_000))

# 64-bit ids are part of the framework contract: dynamic-embedding keys are
# int64 (hash ids can exceed 2^31), matching the reference's int64 KJT
# values. Compute dtypes stay explicit (bf16/f32) everywhere — enabling x64
# only widens what's *representable*; nothing in the compute path creates
# f64 arrays.
_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
