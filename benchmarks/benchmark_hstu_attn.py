"""HSTU attention kernel sweep: batch x seqlen TFLOPS grid.

Counterpart of the reference kernel benchmark
(examples/hstu/training/benchmark/README.md:131 — P10 TFLOPS/MFU heatmaps
over batch {1..128} x seqlen {128..16384}).

Usage: python benchmarks/benchmark_hstu_attn.py [--bwd] [--full]
Emits one JSON object per (batch, seqlen) cell.
"""
import argparse
import json
import time

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

from recsys_examples_tpu.ops.pallas.hstu_attention import hstu_attn_varlen
from recsys_examples_tpu.utils.perf import device_peak_tflops


def run_cell(B, N, H, D, bwd, zipf, iters=10):
    rng = np.random.default_rng(0)
    if zipf:
        lengths = np.minimum(rng.zipf(1.2, B) * max(N // 40, 1), N)
        lengths = lengths.astype(np.int32)
    else:
        lengths = np.full((B,), N, np.int32)
    T = int(lengths.sum())
    T = (T + 127) // 128 * 128 + 128
    offs = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
    mk = lambda: jnp.asarray(
        rng.standard_normal((T, H, D)).astype(np.float32) * 0.3,
        dtype=jnp.bfloat16,
    )
    q, k, v = mk(), mk(), mk()
    aux = (jnp.asarray(offs), None, None)

    if bwd:
        f = jax.jit(jax.grad(
            lambda q, k, v: hstu_attn_varlen(
                q, k, v, aux, max_seqlen=N, alpha=0.08, scaling_seqlen=N
            ).astype(jnp.float32).sum(),
            argnums=(0, 1, 2),
        ))
    else:
        f = jax.jit(lambda q, k, v: hstu_attn_varlen(
            q, k, v, aux, max_seqlen=N, alpha=0.08, scaling_seqlen=N
        ))
    jax.block_until_ready(f(q, k, v))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(f(q, k, v))
        ts.append(time.perf_counter() - t0)
    el = float(np.percentile(ts, 10))
    fl = float((2.0 * 2.0 * H * D * (lengths.astype(np.float64) ** 2) / 2).sum())
    if bwd:
        fl *= 2.0  # dq + dk/dv passes
    return el, fl / el / 1e12, int(lengths.sum())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bwd", action="store_true")
    p.add_argument("--full", action="store_true", help="full-length (no Zipf)")
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--dim", type=int, default=256)
    args = p.parse_args()
    peak = device_peak_tflops()
    for B in (8, 32):
        for N in (512, 2048, 8192):
            el, tflops, tokens = run_cell(
                B, N, args.heads, args.dim, args.bwd, zipf=not args.full
            )
            print(json.dumps({
                "bench": "hstu_attn_kernel",
                "mode": "bwd" if args.bwd else "fwd",
                "batch": B, "max_seqlen": N, "tokens": tokens,
                "p10_ms": round(el * 1e3, 3),
                "tflops": round(tflops, 2),
                "mfu_pct": round(100 * tflops / peak, 2),
            }))


if __name__ == "__main__":
    main()
