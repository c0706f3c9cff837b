"""SID-GR generate() vs generate_beam_decode() latency.

Counterpart of the reference benchmark
(examples/sid_gr/benchmark/benchmark_beam_decode.py, RESULTS.md:70-77 —
e.g. B=16, hist=2048: 3.98s no-KV vs 80ms beam-decode, 49.7x).

Usage: python benchmarks/benchmark_beam_decode.py
"""
import json
import time

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from recsys_examples_tpu.utils.backend import honor_platform_env  # noqa: E402

honor_platform_env()

import jax
import jax.numpy as jnp
import numpy as np

from recsys_examples_tpu.data.sid_batch import random_sid_batch
from recsys_examples_tpu.models.sid_gr import SIDGRConfig, SIDGRModel


def timed(f, *args, iters=5):
    out = f(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    on_tpu = jax.default_backend() == "tpu"
    cfg = SIDGRConfig(
        num_hierarchies=4,
        codebook_size=256,
        hidden_size=1024 if on_tpu else 64,
        num_layers=8 if on_tpu else 2,
        num_heads=8 if on_tpu else 2,
        head_dim=128 if on_tpu else 16,
        ffn_hidden=4096 if on_tpu else 128,
        beam_width=200 if on_tpu else 8,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    model = SIDGRModel(cfg)
    for B, hist in ((1, 256), (16, 256)) if on_tpu else ((2, 8),):
        batch = random_sid_batch(0, B, hist // 1, cfg.num_hierarchies,
                                 cfg.codebook_size)
        params = model.init(
            {"params": jax.random.PRNGKey(0)}, batch, train=False
        )["params"]
        f_base = jax.jit(lambda p, b: model.apply(
            {"params": p}, b, method=SIDGRModel.generate))
        f_kv = jax.jit(lambda p, b: model.apply(
            {"params": p}, b, method=SIDGRModel.generate_beam_decode))
        t_base = timed(f_base, params, batch)
        t_kv = timed(f_kv, params, batch)
        print(json.dumps({
            "bench": "sid_beam_decode",
            "batch": B, "history_items": hist,
            "beam": cfg.beam_width,
            "generate_ms": round(t_base * 1e3, 1),
            "beam_decode_ms": round(t_kv * 1e3, 1),
            "speedup": round(t_base / t_kv, 2),
        }))


if __name__ == "__main__":
    main()
