"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host devices
(xla_force_host_platform_device_count), per the reference's pattern of
single-node multi-process tests (reference: corelib/dynamicemb/test/unit_tests/
test_sequence_embedding.sh) — but here as a single-process SPMD mesh.
"""
import os

# force CPU: the harness may preset JAX_PLATFORMS=axon (the real TPU chip),
# but the test suite is designed for a virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("REXTPU_PREFETCH_DEPTH", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize registers the TPU backend at interpreter start and
# overrides JAX_PLATFORMS; the config knob still wins if set before first
# backend use.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# This environment has very few host cores, making XLA:CPU compiles the
# dominant test cost. Persist compiled executables across pytest runs.
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
