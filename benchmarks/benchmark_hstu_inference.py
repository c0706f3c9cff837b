"""HSTU KV-cached inference benchmark: cold (full recompute) vs warm
(cached-history) latency.

Counterpart of the reference's inference benchmark tables
(examples/hstu/inference/benchmark/README.md: 1.3-2.6x e2e with KV cache +
CUDA graphs; 3-20x for the HSTU block at high cache ratios). Prints one
JSON line.

Usage:
  python benchmarks/benchmark_hstu_inference.py [--batch 8] [--hist 2048]
      [--cand 128] [--layers 8] [--iters 20]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from recsys_examples_tpu.utils.backend import honor_platform_env  # noqa: E402

honor_platform_env()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--hist", type=int, default=2048)
    p.add_argument("--cand", type=int, default=128)
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--hidden", type=int, default=1024)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--dh", type=int, default=256)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

    from recsys_examples_tpu.dynamicemb.batched_table import (
        DynamicEmbeddingTable,
    )
    from recsys_examples_tpu.dynamicemb.dynamicemb_config import (
        DynamicEmbInitializerArgs,
        DynamicEmbInitializerMode,
        DynamicEmbTableOptions,
    )
    from recsys_examples_tpu.dynamicemb.exportable_tables import freeze_table
    from recsys_examples_tpu.dynamicemb.optimizer import SparseOptimizerArgs
    from recsys_examples_tpu.inference.inference_ranking_gr import (
        InferenceDenseModule,
        InferenceRankingGR,
    )
    from recsys_examples_tpu.inference.kvcache import KVCacheConfig
    from recsys_examples_tpu.modules.config import HSTUConfig, KernelBackend

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        args.hist, args.cand, args.layers = 64, 8, 2
        args.hidden, args.heads, args.dh = 64, 2, 32
        args.batch, args.iters = 2, 2

    cfg = HSTUConfig(
        hidden_size=args.hidden, num_layers=args.layers,
        num_attention_heads=args.heads, kv_channels=args.dh,
        hidden_dropout=0.0,
        kernel_backend=KernelBackend.PALLAS if on_tpu else KernelBackend.JNP,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    page = 128 if on_tpu else 8
    maxp = (args.hist + args.cand + page - 1) // page + 1
    kv_cfg = KVCacheConfig(
        num_layers=args.layers, num_heads=args.heads, head_dim=args.dh,
        page_size=page, num_pages=args.batch * maxp * 2,
        max_users=args.batch * 4, max_pages_per_user=maxp,
        dtype=cfg.dtype,
    )

    tbl = DynamicEmbeddingTable(
        DynamicEmbTableOptions(
            embedding_dim=args.hidden, max_capacity=1 << 16,
            bucket_capacity=128 if on_tpu else 16,
            initializer_args=DynamicEmbInitializerArgs(
                mode=DynamicEmbInitializerMode.NORMAL, std_dev=0.1
            ),
        ),
        SparseOptimizerArgs(optimizer="sgd"),
    )
    st = tbl.init_state()
    st, _, _ = tbl.forward_train(
        st, jnp.arange(1, 4096, dtype=jnp.int64)
    )
    frozen = freeze_table(tbl, st)

    mod = InferenceDenseModule(cfg, head_arch=(512, 1) if on_tpu else (8, 1))
    B = args.batch
    S = args.hist + args.cand
    x = jnp.zeros((B, 8, args.hidden), cfg.dtype)
    ck = jnp.zeros((args.layers, B, 0, args.heads, args.dh), cfg.dtype)
    params = mod.init(
        jax.random.PRNGKey(0), x, ck, ck, jnp.zeros((B,), jnp.int32),
        jnp.full((B,), 8, jnp.int32), None, 32,
    )["params"]
    runner = InferenceRankingGR(
        config=cfg, kv_config=kv_cfg, dense_params=params,
        item_table=frozen,
        head_arch=(512, 1) if on_tpu else (8, 1),
    )

    rng = np.random.default_rng(0)
    users = jnp.asarray(np.arange(1, B + 1), jnp.int64)
    seq = jnp.asarray(rng.integers(1, 4000, size=(B, S)), jnp.int64)
    lens = jnp.full((B,), S, jnp.int32)
    ncand = jnp.full((B,), args.cand, jnp.int32)

    chunk = 512 if on_tpu else 32

    def run_cold():
        """Fresh cache: feed history in max_new-bucket chunks (long
        prefills are chunked in serving; the paged kernel holds the
        new-token block in VMEM), then score candidates."""
        runner.init_cache()
        t0 = time.perf_counter()
        logits = None
        for lo in range(0, S, chunk):
            cur = jnp.minimum(lens, lo + chunk)
            logits, _ = runner.forward_with_kvcache(
                users, seq, cur,
                ncand if lo + chunk >= S else None, chunk,
            )
        jax.block_until_ready(logits)
        return time.perf_counter() - t0

    # compile both shapes
    run_cold()
    new_bucket = ((args.cand + 127) // 128) * 128 if on_tpu else args.cand
    logits, _ = runner.forward_with_kvcache(
        users, seq, lens, ncand, max(new_bucket, args.cand)
    )
    jax.block_until_ready(logits)

    # cold: fresh cache, everything recomputed (chunked prefill)
    cold = [run_cold() for _ in range(max(args.iters // 4, 2))]

    # warm: history cached, only candidates recompute
    t0 = time.perf_counter()
    for _ in range(args.iters):
        logits, _ = runner.forward_with_kvcache(
            users, seq, lens, ncand, max(new_bucket, args.cand)
        )
    jax.block_until_ready(logits)
    warm = (time.perf_counter() - t0) / args.iters

    cold_ms = float(np.median(cold)) * 1e3
    warm_ms = warm * 1e3
    out = {
        "metric": "hstu_inference_kvcache_speedup",
        "value": round(cold_ms / warm_ms, 2),
        "unit": "x",
        "detail": {
            "cold_ms": round(cold_ms, 2),
            "warm_ms": round(warm_ms, 2),
            "batch": B, "hist": args.hist, "cand": args.cand,
            "layers": args.layers,
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(out))
    return out


def sweep(argv=None):
    """Cached-vs-uncached sweep over batch x history (the reference's
    inference benchmark tables, examples/hstu/inference/benchmark/
    README.md:41,61). Prints a markdown table + one JSON line."""
    rows = []
    for bs in (1, 4, 8):
        for hist in (1024, 3968):
            r = main([
                "--batch", str(bs), "--hist", str(hist), "--cand", "128",
            ])
            rows.append(r)
    print("\n| batch | hist (cached) | cold ms | warm ms | speedup |")
    print("|---:|---:|---:|---:|---:|")
    for r in rows:
        d = r["detail"]
        print(f"| {d['batch']} | {d['hist']} | {d['cold_ms']} "
              f"| {d['warm_ms']} | {r['value']}x |")
    print(json.dumps({
        "metric": "hstu_inference_sweep",
        "cells": [
            {"batch": r["detail"]["batch"], "hist": r["detail"]["hist"],
             "speedup": r["value"]} for r in rows
        ],
    }))


if __name__ == "__main__":
    import sys as _sys
    if "--sweep" in _sys.argv:
        sweep()
    else:
        main()
