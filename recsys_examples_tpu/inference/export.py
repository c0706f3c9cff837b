"""Ahead-of-time export of the HSTU inference graph.

Counterpart of the reference's torch.export + AOTInductor deployment
(examples/hstu/inference_aoti/export_inference_gr_ranking.py, C++ replay
binaries inference_aoti/cpp_inference/): on TPU the stable artifact is a
serialized `jax.export` StableHLO function — compiled once, replayed from
any process (including non-Python launchers via the PJRT C API) without
retracing Python.

Two artifacts per export:
  <path>/dense_fwd.jaxexport  — serialized StableHLO of the dense forward
                                (params are run-time inputs, not baked)
  <path>/params.msgpack       — flax-serialized dense parameters
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
    return art


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
