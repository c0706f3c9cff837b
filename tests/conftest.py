"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host devices
(xla_force_host_platform_device_count), per the reference's pattern of
single-node multi-process tests (reference: corelib/dynamicemb/test/unit_tests/
test_sequence_embedding.sh) — but here as a single-process SPMD mesh.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
