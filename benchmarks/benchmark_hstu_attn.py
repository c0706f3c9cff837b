"""HSTU attention kernel sweep: batch x seqlen TFLOPS grid.

Counterpart of the reference kernel benchmark
(examples/hstu/training/benchmark/README.md:131 — P10 TFLOPS/MFU heatmaps
over batch {1..128} x seqlen {128..16384}).

Usage:
  python benchmarks/benchmark_hstu_attn.py [--bwd] [--full]      # 6 cells
  python benchmarks/benchmark_hstu_attn.py --grid [--bwd]        # heatmap
    batch {1,4,8,16,32} x seqlen {256..8192}, full-length rows, JSON grid
    written to benchmarks/results/attn_heatmap_{fwd|bwd}.json

Each timed sample chains CHAIN kernel calls inside one jit (inputs
perturbed per link to defeat LICM hoisting) so the ~3 ms per-dispatch
axon-tunnel latency is amortized out of small cells.
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

from recsys_examples_tpu.utils.backend import honor_platform_env  # noqa: E402

honor_platform_env()

import jax
import jax.numpy as jnp
import numpy as np

from recsys_examples_tpu.ops.pallas.hstu_attention import hstu_attn_varlen
from recsys_examples_tpu.utils.perf import device_peak_tflops

CHAIN = 4  # kernel calls per dispatch


def run_cell(B, N, H, D, bwd, zipf, iters=8, block_q=128, block_k=128):
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

    def one(qq, kk, vv):
        return hstu_attn_varlen(
            qq, kk, vv, aux, max_seqlen=N, alpha=0.08, scaling_seqlen=N,
            block_q=block_q, block_k=block_k,
        )

    if bwd:
        g = jax.value_and_grad(
            lambda qq, kk, vv: one(qq, kk, vv).astype(jnp.float32).sum(),
            argnums=(0, 1, 2),
        )

        def chained(q, k, v):
            def body(i, carry):
                qq, acc = carry
                # the carry must consume the fwd VALUE and ALL THREE
                # grads, or XLA dead-code-eliminates the untouched
                # pallas_calls (the dq and dkv backwards are separate
                # kernels; the fwd output is not a VJP residual) and the
                # cell times only a fraction of the 3.5x-credited work
                out, (dq, dk, dv) = g(qq, k, v)
                acc = (acc + out
                       + dq[0, 0, 0].astype(jnp.float32)
                       + dk[0, 0, 0].astype(jnp.float32)
                       + dv[0, 0, 0].astype(jnp.float32))
                # perturb the input per link so XLA cannot hoist the
                # loop-invariant chain out (LICM trap — see repo notes)
                qq = q + (acc * 1e-12).astype(q.dtype)
                return qq, acc
            _, acc = jax.lax.fori_loop(
                0, CHAIN, body, (q, jnp.float32(0))
            )
            return acc
    else:
        def chained(q, k, v):
            def body(i, carry):
                qq, acc = carry
                out = one(qq, k, v)
                acc = acc + out[0, 0, 0].astype(jnp.float32)
                qq = q + (acc * 1e-12).astype(q.dtype)
                return qq, acc
            _, acc = jax.lax.fori_loop(
                0, CHAIN, body, (q, jnp.float32(0))
            )
            return acc

    f = jax.jit(chained)
    jax.block_until_ready(f(q, k, v))
    # This host's dispatch+sync round-trip over the axon tunnel is ~28 ms
    # (measured: solving chain-4 vs chain-16 per-link times gives ~6 ms of
    # device work + ~28 ms fixed per synchronized dispatch). One blocked
    # dispatch per sample would charge that latency to the kernel, so each
    # timing round enqueues PIPE dispatches back-to-back and blocks once —
    # the reference's CUDA-event timing likewise excludes launch latency.
    PIPE = 6
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(PIPE):
            out = f(q, k, v)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / (CHAIN * PIPE))
    el = float(np.percentile(ts, 10))
    fl = float((2.0 * 2.0 * H * D * (lengths.astype(np.float64) ** 2) / 2).sum())
    if bwd:
        # jax.grad runs fwd + bwd; semantic FLOPs = 3.5x fwd (flash
        # convention, same as the e2e model's attention accounting) —
        # the bwd kernels' score recompute is NOT credited
        fl *= 3.5
    return el, fl / el / 1e12, int(lengths.sum())


def run_int8_compare(H, D):
    """Int8 vs bf16 forward at MXU-bound training shapes AND the
    DMA-bound serving regime (small batch, long sequence) where halved
    K/V HBM traffic is the theoretical win. Emits one JSON line per
    shape with the speedup, settling VERDICT's win-or-demote question
    with data."""
    from recsys_examples_tpu.ops.pallas.hstu_attention import (
        hstu_attn_varlen_quantized_calibrated,
        quantize_per_tensor,
    )

    interp = jax.default_backend() != "tpu"
    shapes = ((1, 8192), (1, 4096), (2, 8192), (8, 4096), (32, 1024))
    if interp:  # CPU smoke: interpret mode, keep it tiny
        shapes = ((1, 256), (2, 128))
    for B, N in shapes:
        rng = np.random.default_rng(0)
        lengths = np.full((B,), N, np.int32)
        T = B * N
        offs = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)

        def mk():
            return jnp.asarray(
                rng.standard_normal((T, H, D)).astype(np.float32) * 0.3,
                jnp.bfloat16,
            )

        q, k, v = mk(), mk(), mk()
        aux = (jnp.asarray(offs), None, None)
        qi, qs = quantize_per_tensor(q)
        ki, ks = quantize_per_tensor(k)
        vi, vs = quantize_per_tensor(v)

        f_bf16 = jax.jit(lambda q, k, v: hstu_attn_varlen(
            q, k, v, aux, max_seqlen=N, alpha=0.08, scaling_seqlen=N,
            interpret=interp,
        ))
        f_int8 = jax.jit(lambda q, k, v: hstu_attn_varlen_quantized_calibrated(
            q, k, v, float(qs), float(ks), float(vs), aux,
            max_seqlen=N, alpha=0.08, scaling_seqlen=N, interpret=interp,
        ))
        jax.block_until_ready(f_bf16(q, k, v))
        jax.block_until_ready(f_int8(qi, ki, vi))

        def bench(f, *a, iters=8, pipe=6):
            # pipeline dispatches so the ~28 ms tunnel sync latency does
            # not mask real kernel-time differences between the two paths
            ts = []
            for _ in range(iters):
                t0 = time.perf_counter()
                for _ in range(pipe):
                    out = f(*a)
                jax.block_until_ready(out)
                ts.append((time.perf_counter() - t0) / pipe)
            return float(np.percentile(ts, 10))

        t_bf = bench(f_bf16, q, k, v)
        t_i8 = bench(f_int8, qi, ki, vi)
        print(json.dumps({
            "bench": "hstu_attn_int8_vs_bf16", "batch": B, "seqlen": N,
            "bf16_ms": round(t_bf * 1e3, 3),
            "int8_ms": round(t_i8 * 1e3, 3),
            "speedup": round(t_bf / t_i8, 3),
            "backend": jax.default_backend(),
        }))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bwd", action="store_true")
    p.add_argument("--full", action="store_true", help="full-length (no Zipf)")
    p.add_argument("--grid", action="store_true",
                   help="batch x seqlen heatmap, write JSON artifact")
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--int8", action="store_true",
                   help="int8 vs bf16 forward across shapes incl. the "
                        "DMA-bound serving regime (batch 1, long seq)")
    p.add_argument("--block-q", type=int, default=128)
    p.add_argument("--block-k", type=int, default=128)
    args = p.parse_args()
    peak = device_peak_tflops()
    mode = "bwd" if args.bwd else "fwd"

    if args.int8:
        run_int8_compare(args.heads, args.dim)
        return

    if args.grid:
        batches = (1, 4, 8, 16, 32)
        seqlens = (256, 512, 1024, 2048, 4096, 8192)
        cells = []
        for B in batches:
            for N in seqlens:
                if B * N > 32 * 8192:   # HBM guard (same cap as ref grid)
                    continue
                el, tflops, tokens = run_cell(
                    B, N, args.heads, args.dim, args.bwd, zipf=False,
                    block_q=args.block_q, block_k=args.block_k,
                )
                cell = {
                    "batch": B, "max_seqlen": N, "tokens": tokens,
                    "p10_ms": round(el * 1e3, 3),
                    "tflops": round(tflops, 2),
                    "mfu_pct": round(100 * tflops / peak, 2),
                }
                cells.append(cell)
                print(json.dumps({"bench": "hstu_attn_kernel",
                                  "mode": mode, **cell}), flush=True)
        out = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "results",
        )
        os.makedirs(out, exist_ok=True)
        path = os.path.join(out, f"attn_heatmap_{mode}.json")
        with open(path, "w") as fh:
            json.dump({
                "bench": "hstu_attn_kernel_heatmap", "mode": mode,
                "heads": args.heads, "head_dim": args.dim,
                "dtype": "bfloat16", "peak_tflops": peak,
                "device": jax.devices()[0].device_kind,
                "cells": cells,
            }, fh, indent=1)
        print(f"# wrote {path}")
        return

    for B in (8, 32):
        for N in (512, 2048, 8192):
            el, tflops, tokens = run_cell(
                B, N, args.heads, args.dim, args.bwd, zipf=not args.full,
                block_q=args.block_q, block_k=args.block_k,
            )
            print(json.dumps({
                "bench": "hstu_attn_kernel",
                "mode": mode,
                "batch": B, "max_seqlen": N, "tokens": tokens,
                "p10_ms": round(el * 1e3, 3),
                "tflops": round(tflops, 2),
                "mfu_pct": round(100 * tflops / peak, 2),
            }))


if __name__ == "__main__":
    main()
