"""SID-GR serving benchmark: offline batched throughput + per-request
latency through the continuous scheduler.

Counterpart of the reference's serving benchmarks
(examples/sid-gr-inference/README.md "offline"/"online" tables vs SGLang;
benchmarks/ + tools/ harnesses). Prints one JSON line per configuration.

Usage:
  python benchmarks/benchmark_sid_serving.py [--backbone sidgr|qwen3]
      [--beam 64] [--ctx 512] [--batch 8] [--iters 20]
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
    p.add_argument("--backbone", default="sidgr", choices=["sidgr", "qwen3"])
    p.add_argument("--beam", type=int, default=64)
    p.add_argument("--ctx", type=int, default=512)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--hierarchies", type=int, default=4)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

    from recsys_examples_tpu.inference.sid_serving.engine import (
        GRServingEngine,
        Qwen3ServingEngine,
        ServingConfig,
    )
    from recsys_examples_tpu.inference.sid_serving.scheduler import (
        GRContinuousScheduler,
    )

    on_tpu = jax.default_backend() == "tpu"
    scfg = ServingConfig(
        beam_width=args.beam,
        ctx_buckets=(args.ctx,),
        batch_buckets=(args.batch,),
    )
    rng = np.random.default_rng(0)

    if args.backbone == "qwen3":
        from recsys_examples_tpu.models.qwen3 import Qwen3Config, Qwen3Model

        cfg = Qwen3Config(
            vocab_size=1024, hidden_size=512 if on_tpu else 64,
            num_layers=8 if on_tpu else 2, num_heads=4, num_kv_heads=2,
            head_dim=128, intermediate_size=1024 if on_tpu else 128,
            dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        )
        model = Qwen3Model(cfg)
        tok = jnp.zeros((2, 8), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), tok,
                            jnp.asarray([8, 8], jnp.int32))
        eng = Qwen3ServingEngine(
            model, params, scfg, num_steps=args.hierarchies,
        )
        vocab = cfg.vocab_size
    else:
        from recsys_examples_tpu.data.sid_batch import random_sid_batch
        from recsys_examples_tpu.models.sid_gr import SIDGRConfig, SIDGRModel

        cfg = SIDGRConfig(
            num_hierarchies=args.hierarchies, codebook_size=256,
            hidden_size=512 if on_tpu else 64,
            num_layers=8 if on_tpu else 2, num_heads=4,
            head_dim=128 if on_tpu else 16,
            ffn_hidden=1024 if on_tpu else 128,
            beam_width=args.beam,
            dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        )
        model = SIDGRModel(cfg)
        batch = random_sid_batch(0, 2, 8, args.hierarchies, 256)
        params = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            batch, train=False,
        )["params"]
        eng = GRServingEngine(model, params, scfg)
        vocab = 256

    def mk_ctx():
        n = int(rng.integers(args.ctx // 2, args.ctx))
        n -= n % args.hierarchies
        return rng.integers(0, vocab, size=(max(n, args.hierarchies),)).astype(np.int32)

    # ---- offline: batched generate throughput
    ctxs = [mk_ctx() for _ in range(args.batch)]
    eng.generate(ctxs)  # compile
    t0 = time.perf_counter()
    for _ in range(args.iters):
        eng.generate(ctxs)
    dt = (time.perf_counter() - t0) / args.iters
    offline_ms = dt * 1e3
    req_s = args.batch / dt

    # ---- online-ish: per-request latency through the scheduler
    sched = GRContinuousScheduler(eng, max_batch=args.batch)
    lat = []
    for _ in range(args.iters):
        rids = [sched.submit(mk_ctx(), top_k=10) for _ in range(args.batch)]
        sched.run_until_empty()
        for rid in rids:
            r = sched.get_result(rid)
            lat.append(r["latency_ms"])
    lat = np.asarray(lat)

    print(json.dumps({
        "metric": "sid_serving",
        "backbone": args.backbone,
        "beam": args.beam,
        "ctx_bucket": args.ctx,
        "batch": args.batch,
        "offline_batch_ms": round(offline_ms, 2),
        "offline_req_per_s": round(req_s, 2),
        "online_median_ms": round(float(np.median(lat)), 2),
        "online_p99_ms": round(float(np.percentile(lat, 99)), 2),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
