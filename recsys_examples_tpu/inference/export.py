"""Ahead-of-time export of the HSTU inference graph.

Counterpart of the reference's torch.export + AOTInductor deployment
(examples/hstu/inference_aoti/export_inference_gr_ranking.py, C++ replay
binaries inference_aoti/cpp_inference/): on TPU the stable artifact is a
serialized `jax.export` StableHLO function — compiled once, replayed from
any process (including non-Python launchers via the PJRT C API) without
retracing Python.

Artifacts per export:
  <path>/dense_fwd.jaxexport  — serialized StableHLO of the dense forward
                                (params are run-time inputs, not baked)
  <path>/params.msgpack       — flax-serialized dense parameters
  <path>/dense_fwd.mlir       — raw StableHLO text for non-Python runtimes
  <path>/replay_spec.txt      — flat input manifest (name/dtype/shape in
                                call order) for csrc/pjrt_replay.cpp
  <path>/inputs.bin           — concatenated row-major input payloads
                                (real params; zero runtime tensors)

The .mlir + spec + bin triple is what the standalone C++ deployment
binary (csrc/pjrt_replay.cpp) consumes through the PJRT C API — the
reference's AOTI cpp_inference analogue with no Python in the serving
process.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization
from flax.core import unfreeze


def _plain_params(params):
    """Unbox flax Partitioned metadata and unfreeze to a plain dict so the
    tree serializes through jax.export/msgpack."""
    return jax.tree.map(
        lambda x: x.unbox() if isinstance(x, nn.Partitioned) else x,
        unfreeze(params),
        is_leaf=lambda x: isinstance(x, nn.Partitioned),
    )

from recsys_examples_tpu.inference.inference_ranking_gr import (
    InferenceDenseModule,
    InferenceRankingGR,
)


def export_ranking_dense(
    runner: InferenceRankingGR,
    batch_size: int,
    max_new: int,
    max_cached: int,
    path: str,
) -> str:
    """Serialize the dense forward (gather-KV path) for (B, max_new,
    max_cached) bucket shapes. Returns the artifact path."""
    os.makedirs(path, exist_ok=True)
    cfg, kcfg = runner.config, runner.kv_config
    H, dh = kcfg.num_heads, kcfg.head_dim
    L = kcfg.num_layers
    scaling = (
        cfg.scaling_seqlen if cfg.scaling_seqlen > 0 else kcfg.max_cached_len
    )

    plain = _plain_params(runner.dense_params)

    def fwd(params, emb, ck, cv, clen, new_lens, ncand):
        logits, ks, vs = runner.module.apply(
            {"params": params}, emb, ck, cv, clen, new_lens, ncand, scaling
        )
        return logits, ks, vs

    shapes = (
        jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), plain
        ),
        jax.ShapeDtypeStruct((batch_size, max_new, cfg.hidden_size),
                             cfg.dtype),
        jax.ShapeDtypeStruct((L, batch_size, max_cached, H, dh), kcfg.dtype),
        jax.ShapeDtypeStruct((L, batch_size, max_cached, H, dh), kcfg.dtype),
        jax.ShapeDtypeStruct((batch_size,), jnp.int32),
        jax.ShapeDtypeStruct((batch_size,), jnp.int32),
        jax.ShapeDtypeStruct((batch_size,), jnp.int32),
    )
    exported = jax.export.export(jax.jit(fwd))(*shapes)
    art = os.path.join(path, "dense_fwd.jaxexport")
    with open(art, "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(path, "params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(plain))
    write_replay_artifacts(
        path, "dense_fwd", exported, shapes, values=(plain,)
    )
    return art


_SPEC_DTYPE = {
    "float32": "f32", "bfloat16": "bf16", "float16": "f16",
    "float64": "f64", "int32": "s32", "int64": "s64", "int16": "s16",
    "int8": "s8", "uint32": "u32", "uint64": "u64", "uint16": "u16",
    "uint8": "u8", "bool": "pred",
}


def write_replay_artifacts(path, name, exported, shapes, values=()):
    """Emit the C++ replay triple (.mlir / replay_spec.txt / inputs.bin)
    for `exported`. `shapes` is the arg tree passed to jax.export;
    `values` is a prefix of the SAME tree structure with concrete arrays
    (the params) — serialized into inputs.bin in call order; remaining
    inputs are zero-filled by the replayer."""
    with open(os.path.join(path, f"{name}.mlir"), "w") as f:
        f.write(exported.mlir_module())
    flat_shapes = jax.tree.leaves(shapes)
    flat_vals = jax.tree.leaves(values)
    lines = [
        "# pjrt_replay input manifest — flattened call-order args of "
        f"{name}.mlir",
        "data inputs.bin",
    ]
    with open(os.path.join(path, "inputs.bin"), "wb") as bf:
        for i, s in enumerate(flat_shapes):
            dt = _SPEC_DTYPE[np.dtype(s.dtype).name]
            dims = ",".join(str(d) for d in s.shape) if s.shape else "-"
            lines.append(f"input arg{i} {dt} {dims}")
            if i < len(flat_vals):
                arr = np.ascontiguousarray(flat_vals[i])
                assert arr.shape == tuple(s.shape), (arr.shape, s.shape)
                bf.write(arr.tobytes())
    with open(os.path.join(path, "replay_spec.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


class ExportedRankingDense:
    """Replay side: load + call the exported artifact
    (reference analogue: AOTI .so replay, inference_aoti/cpp_inference)."""

    def __init__(self, path: str, params_template=None):
        with open(os.path.join(path, "dense_fwd.jaxexport"), "rb") as f:
            self._fn = jax.export.deserialize(f.read())
        with open(os.path.join(path, "params.msgpack"), "rb") as f:
            raw = f.read()
        if params_template is not None:
            self.params = serialization.from_bytes(
                _plain_params(params_template), raw
            )
        else:
            self.params = serialization.msgpack_restore(raw)

    def __call__(self, emb, ck, cv, clen, new_lens, ncand):
        return self._fn.call(
            self.params, emb, ck, cv, clen, new_lens, ncand
        )
