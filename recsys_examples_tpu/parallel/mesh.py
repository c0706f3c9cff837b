"""Device mesh + parameter sharding helpers.

Replaces the reference's NCCL/Megatron/TorchRec process-group plumbing
(examples/commons/utils/initialize.py:60 `initialize_model_parallel`) with a
single `jax.sharding.Mesh` over ("data", "model"):

  - dense params: replicated over "data", TP-sharded over "model" via flax
    `nn.with_partitioning` metadata -> GSPMD inserts the collectives.
  - dynamic embedding tables: row-sharded over "data" (manual shard_map
    all-to-all exchange in dynamicemb/sharded_collection.py).
  - batch arrays: leading (flattened-token / batch) dims sharded over
    "data"; sequences never cross shard boundaries by construction.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    dp: int = -1, tp: int = 1, devices=None
) -> Mesh:
    """Mesh of shape (dp, tp) with axes ("data", "model").

    dp=-1 uses all remaining devices.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp == -1:
        assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
        dp = n // tp
    assert dp * tp == n, f"dp*tp={dp * tp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def param_shardings(mesh: Mesh, params):
    """(unboxed_params, NamedShardings) from flax nn.with_partitioning
    metadata. flax `Partitioned` boxes are pytree nodes, so sharding
    placement happens on the unboxed tree."""
    import flax.linen as nn
    from flax.core import meta

    specs = nn.get_partition_spec(params)
    unboxed = meta.unbox(params)
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    return unboxed, shardings


def shard_params(mesh: Mesh, params):
    """device_put params onto the mesh per their partitioning metadata."""
    unboxed, shardings = param_shardings(mesh, params)
    return jax.tree.map(jax.device_put, unboxed, shardings)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def make_multislice_mesh(
    dp_dcn: int, dp: int = -1, tp: int = 1, devices=None
) -> Mesh:
    """Multi-slice mesh ("dcn", "data", "model") for data parallelism
    across slices over DCN and dp x tp within each slice over ICI
    (reference analogue: multi-node NCCL process groups; here the axis
    split tells GSPMD which collectives ride which fabric — keep gradient
    all-reduces on "dcn"+"data" and TP collectives on "model"/ICI only).

    Devices must be ordered slice-major (jax.devices() already is for
    multi-slice TPU deployments)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    per_slice = n // dp_dcn
    assert per_slice * dp_dcn == n, (n, dp_dcn)
    if dp == -1:
        assert per_slice % tp == 0
        dp = per_slice // tp
    assert dp * tp == per_slice
    arr = np.asarray(devices).reshape(dp_dcn, dp, tp)
    return Mesh(arr, ("dcn", DATA_AXIS, MODEL_AXIS))
