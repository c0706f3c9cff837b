"""SID-GR serving soak + scheduler comparison harness.

Counterpart of the reference's serving tools
(examples/sid-gr-inference/tools/: SGLang comparison scripts, soak tests).
No external baseline exists on this host, so the comparison is between
the two in-repo schedulers on identical load:
  - batch   : GRContinuousScheduler (batch-at-a-time, scheduler.py)
  - stepwise: ContinuousGRScheduler (continuous.py, pooled decode state)

Soak: sustained Poisson-ish arrivals of mixed context lengths; reports
throughput, latency percentiles, pool high-water and leak checks.

Usage: python tools/serving_soak.py [--requests 64] [--seconds 0]
Prints one JSON line per scheduler.
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


def build(beam=16, layers=2, hidden=64):
    import jax
    import jax.numpy as jnp

    from recsys_examples_tpu.data.sid_batch import SIDBatch
    from recsys_examples_tpu.models.sid_gr import SIDGRConfig, SIDGRModel

    H = 4
    cfg = SIDGRConfig(
        num_hierarchies=H, codebook_size=256, hidden_size=hidden,
        num_layers=layers, num_heads=4, head_dim=hidden // 4,
        ffn_hidden=hidden * 4, beam_width=beam,
        dtype=jnp.bfloat16 if jax.default_backend() == "tpu"
        else jnp.float32,
    )
    model = SIDGRModel(cfg)
    batch = SIDBatch(
        history_sids=jnp.zeros((64,), jnp.int32),
        history_lengths=jnp.asarray([8], jnp.int32),
        history_offsets=jnp.asarray([0, 8], jnp.int32),
        candidate_sids=jnp.zeros((1, H), jnp.int32),
        batch_size=1, num_hierarchies=H, max_history_tokens=64,
    )
    import jax as _jax

    params = model.init(_jax.random.PRNGKey(0), batch)["params"]
    return model, params, H


def drive(sched, contexts, label, warmup=True):
    if warmup:
        # compile all (step, batch-bucket, ctx-bucket) executables before
        # the measured phase (the reference pre-captures CUDA graphs the
        # same way)
        H = sched.model.config.num_hierarchies if hasattr(sched, "model") \
            else sched.engine.model.config.num_hierarchies
        rng = np.random.default_rng(99)
        for n in (2, 24):
            for _ in range(3):
                sched.submit(rng.integers(0, 256, n * H).astype(np.int32))
            sched.run_until_empty()
        for r in list(getattr(sched, "finished", {})):
            sched.get_result(r)
        sched.metrics.clear()
    t0 = time.time()
    lat = {}
    rids = []
    for i, c in enumerate(contexts):
        rid = sched.submit(c)
        rids.append(rid)
        # interleave submission with ticking (online load)
        if i % 2 == 1:
            sched.tick()
    sched.run_until_empty()
    total = time.time() - t0
    lats = []
    for rid in rids:
        r = sched.get_result(rid)
        assert r is not None and "error" not in r, r
        lats.append(r["latency_ms"])
    lats = np.asarray(lats)
    st = sched.status()
    out = {
        "scheduler": label,
        "requests": len(contexts),
        "total_s": round(total, 2),
        "req_per_s": round(len(contexts) / total, 2),
        "latency_ms_p50": round(float(np.percentile(lats, 50)), 1),
        "latency_ms_p99": round(float(np.percentile(lats, 99)), 1),
    }
    if "pool_high_water" in st:
        out["pool_high_water"] = st["pool_high_water"]
        out["pool_leaks"] = any(st["pool_leaks"].values())
    if hasattr(sched, "get_metrics"):
        m = sched.get_metrics()
        out["dispatches"] = m["counters"].get("dispatches", 0)
        out["steps_per_dispatch"] = m.get("steps_per_dispatch")
    print(json.dumps(out))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--beam", type=int, default=16)
    ap.add_argument("--steps-per-dispatch", type=int, nargs="+",
                    default=[1, 2, 3],
                    help="dispatch-coalescing factors to compare "
                    "(>= H-1 engages the pool-free full-chain fast path)")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from recsys_examples_tpu.inference.sid_serving.continuous import (
        ContinuousGRScheduler,
    )
    from recsys_examples_tpu.inference.sid_serving.engine import (
        GRServingEngine, ServingConfig,
    )
    from recsys_examples_tpu.inference.sid_serving.scheduler import (
        BeamPolicy, GRContinuousScheduler,
    )

    model, params, H = build(beam=args.beam)
    scfg = ServingConfig(
        beam_width=args.beam, ctx_buckets=(32, 128),
        batch_buckets=(1, 2, 4, 8), max_batch_tokens=1024,
    )
    rng = np.random.default_rng(0)
    contexts = [
        rng.integers(0, 256, int(n) * H).astype(np.int32)
        for n in rng.choice([2, 4, 8, 24], args.requests)
    ]

    for spd in args.steps_per_dispatch:
        stepwise = ContinuousGRScheduler(
            model, params, scfg, max_batch=8,
            beam_policy=BeamPolicy(width=args.beam),
            steps_per_dispatch=spd,
        )
        drive(stepwise, contexts, f"stepwise-continuous/spd={spd}")

    engine = GRServingEngine(model, params, scfg)
    batch_sched = GRContinuousScheduler(engine, max_batch=8)
    drive(batch_sched, contexts, "batch-at-a-time")


if __name__ == "__main__":
    main()
