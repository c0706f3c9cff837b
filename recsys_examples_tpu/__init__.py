"""recsys_examples_tpu — TPU-native generative recommender framework.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of
NVIDIA/recsys-examples: dynamic (hash-mapped) embeddings with
admission/eviction, HSTU ranking/retrieval training, SID-GR training and
large-beam serving — designed TPU-first (SPMD meshes, functional state,
static shapes, Pallas kernels on the hot path).
"""

__version__ = "0.1.0"
