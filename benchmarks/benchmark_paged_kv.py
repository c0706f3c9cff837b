"""bf16 vs int8 KV pages: warm-decode paged-attention microbench.

The paged delta kernel is DMA-bound at decode shapes (tiny S, long cached
history): per step it streams `cached/PG` K+V pages from HBM while doing
O(S*cached*dh) MXU work. int8 pages halve the streamed bytes
(quantize_kv_pages), so the speed-of-light win is ~2x when DMA-bound.
This bench decides VERDICT r3 #6 (int8: win or demote) with on-chip
numbers. Reference analogue: hstu_attn quantization_mode as a perf
feature (hstu_attn_interface.py:185).

Prints one JSON line per (hist, batch) point with bf16/int8 ms and the
ratio; writes benchmarks/results/paged_kv_int8.json.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from recsys_examples_tpu.utils.backend import honor_platform_env  # noqa: E402

honor_platform_env()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[1, 8])
    ap.add_argument("--hist", type=int, nargs="+", default=[1024, 3968])
    ap.add_argument("--new", type=int, default=8)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--dh", type=int, default=256)
    ap.add_argument("--page", type=int, default=128)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--chain", type=int, default=10,
                    help="kernel calls chained per dispatch (amortizes "
                    "the ~3 ms axon dispatch latency)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from recsys_examples_tpu.ops.pallas.paged_hstu_attention import (
        paged_hstu_delta_attention,
        quantize_kv_pages,
    )

    backend = jax.default_backend()
    dt = jnp.bfloat16 if backend == "tpu" else jnp.float32
    H, dh, PG, S = args.heads, args.dh, args.page, args.new
    results = []
    for hist in args.hist:
        maxp = (hist + PG - 1) // PG
        for B in args.batch:
            P = B * maxp + 8
            key = jax.random.PRNGKey(0)
            ks = jax.random.split(key, 6)
            q = jax.random.normal(ks[0], (B, S, H, dh), dt)
            kp = jax.random.normal(ks[1], (P, PG, H, dh), dt)
            vp = jax.random.normal(ks[2], (P, PG, H, dh), dt)
            pt = jnp.arange(B * maxp, dtype=jnp.int32).reshape(B, maxp)
            cached = jnp.full((B,), hist, jnp.int32)
            nk = jax.random.normal(ks[3], (B, S, H, dh), dt)
            nv = jax.random.normal(ks[4], (B, S, H, dh), dt)
            nl = jnp.full((B,), S, jnp.int32)
            alpha = 1.0 / dh ** 0.5
            scaling = float(hist + S)
            k8, v8, ksc, vsc = jax.jit(quantize_kv_pages)(kp, vp)

            def make(fn_kwargs):
                def chained(q, *tensors):
                    def body(i, acc):
                        # vary q per iteration to defeat LICM
                        qq = q + acc[0, 0, 0, 0] * 1e-12
                        o = paged_hstu_delta_attention(
                            qq, *tensors, cached, nk, nv, nl, None,
                            alpha, scaling, backend="pallas",
                            **fn_kwargs,
                        )
                        return acc + o
                    z = jnp.zeros((B, S, H, dh), jnp.float32)
                    return jax.lax.fori_loop(0, args.chain, body, z)
                return jax.jit(chained)

            f_bf16 = make({})
            f_int8 = make({"k_scales": ksc, "v_scales": vsc})

            def bench(f, *tensors):
                o = f(q, *tensors)
                o.block_until_ready()
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    o = f(q, *tensors)
                o.block_until_ready()
                return (time.perf_counter() - t0) / (
                    args.iters * args.chain) * 1e3

            ms_bf16 = bench(f_bf16, kp, vp, pt)
            ms_int8 = bench(f_int8, k8, v8, pt)
            gbps = (
                2 * B * hist * H * dh * (2 if dt == jnp.bfloat16 else 4)
                / (ms_bf16 * 1e-3) / 1e9
            )
            rec = {
                "bench": "paged_kv_int8",
                "backend": backend,
                "batch": B, "hist": hist, "new": S,
                "bf16_ms": round(ms_bf16, 4),
                "int8_ms": round(ms_int8, 4),
                "speedup": round(ms_bf16 / ms_int8, 3),
                "bf16_page_gbps": round(gbps, 1),
            }
            results.append(rec)
            print(json.dumps(rec))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "paged_kv_int8.json"), "w") as f:
        json.dump({"backend": backend, "results": results}, f, indent=1)


if __name__ == "__main__":
    main()
