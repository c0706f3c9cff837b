"""HTTP load generator for the serving front-ends.

Counterpart of the reference's serving client scripts
(examples/hstu/inference/triton client test, sid-gr-inference/tools/
SGLang comparison drivers): Poisson-ish arrivals at a target rate with
bounded concurrency against either server, reporting throughput, latency
percentiles, and HTTP error counts.

Targets:
  --url http://host:port            an already-running server
  --inprocess ranking|sid           spin a demo server in-process (no
                                    ports; aiohttp TestServer) — used for
                                    hermetic benchmarking and CI smoke

Usage:
  python tools/http_loadgen.py --inprocess ranking --requests 64 --rate 50
  python tools/http_loadgen.py --url http://localhost:8000 --endpoint /predict
"""
import argparse
import asyncio
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def build_ranking_app():
    import jax
    import jax.numpy as jnp

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
    from recsys_examples_tpu.inference.hstu_serving import (
        RankingServer,
        create_app,
    )
    from recsys_examples_tpu.inference.inference_ranking_gr import (
        InferenceDenseModule,
        InferenceRankingGR,
    )
    from recsys_examples_tpu.inference.kvcache import KVCacheConfig
    from recsys_examples_tpu.modules.config import HSTUConfig, KernelBackend

    on_tpu = jax.default_backend() == "tpu"
    D = 64 if on_tpu else 16
    cfg = HSTUConfig(
        hidden_size=D, num_layers=2, num_attention_heads=2,
        kv_channels=D // 2, hidden_dropout=0.0,
        kernel_backend=KernelBackend.PALLAS if on_tpu else KernelBackend.JNP,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    kv = KVCacheConfig(
        num_layers=2, num_heads=2, head_dim=D // 2, page_size=16,
        num_pages=512, max_users=64, max_pages_per_user=16,
        dtype=cfg.dtype,
    )
    tbl = DynamicEmbeddingTable(
        DynamicEmbTableOptions(
            embedding_dim=D, max_capacity=1 << 14, bucket_capacity=32,
            initializer_args=DynamicEmbInitializerArgs(
                mode=DynamicEmbInitializerMode.NORMAL, std_dev=0.3
            ),
        ),
        SparseOptimizerArgs(optimizer="sgd"),
    )
    st = tbl.init_state()
    st, _, _ = tbl.forward_train(
        st, jnp.arange(1, 10000, dtype=jnp.int64)
    )
    mod = InferenceDenseModule(cfg, head_arch=(D, 1))
    B, S = 2, 32
    x = jnp.zeros((B, S, D), cfg.dtype)
    ck = jnp.zeros((2, B, 0, 2, D // 2), cfg.dtype)
    params = mod.init(
        jax.random.PRNGKey(0), x, ck, ck, jnp.zeros((B,), jnp.int32),
        jnp.full((B,), S, jnp.int32), None, kv.max_cached_len,
    )["params"]
    runner = InferenceRankingGR(
        config=cfg, kv_config=kv, dense_params=params,
        item_table=freeze_table(tbl, st), head_arch=(D, 1),
    )
    runner.init_cache()
    app = create_app(RankingServer(runner, seq_buckets=(32, 128)))

    def gen_payload(rng):
        n = int(rng.integers(4, 28))
        return "/predict", {
            "user_id": int(rng.integers(0, 64)),
            "item_ids": rng.integers(1, 9999, n).tolist(),
            "num_candidates": int(rng.integers(1, 4)),
            "timeout_s": 120.0,   # tolerate first-compile stalls
        }

    return app, gen_payload


def build_sid_app():
    import jax
    import jax.numpy as jnp

    from recsys_examples_tpu.data.sid_batch import SIDBatch
    from recsys_examples_tpu.inference.sid_serving.continuous import (
        ContinuousGRScheduler,
    )
    from recsys_examples_tpu.inference.sid_serving.engine import (
        ServingConfig,
    )
    from recsys_examples_tpu.inference.sid_serving.http import create_app
    from recsys_examples_tpu.inference.sid_serving.scheduler import (
        BeamPolicy,
    )
    from recsys_examples_tpu.models.sid_gr import SIDGRConfig, SIDGRModel

    on_tpu = jax.default_backend() == "tpu"
    H = 4
    cfg = SIDGRConfig(
        num_hierarchies=H, codebook_size=64, hidden_size=64, num_layers=2,
        num_heads=4, head_dim=16, ffn_hidden=256, beam_width=8,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    model = SIDGRModel(cfg)
    probe = SIDBatch(
        history_sids=jnp.zeros((64,), jnp.int32),
        history_lengths=jnp.asarray([8], jnp.int32),
        history_offsets=jnp.asarray([0, 8], jnp.int32),
        candidate_sids=jnp.zeros((1, H), jnp.int32),
        batch_size=1, num_hierarchies=H, max_history_tokens=64,
    )
    params = model.init(jax.random.PRNGKey(0), probe)["params"]
    sched = ContinuousGRScheduler(
        model, params,
        ServingConfig(beam_width=8, ctx_buckets=(64,),
                      batch_buckets=(1, 2, 4), max_batch_tokens=4096),
        max_batch=4, beam_policy=BeamPolicy(kind="fixed", width=8),
    )
    app = create_app(sched)

    def gen_payload(rng):
        n = int(rng.integers(2, 8))
        return "/generate", {
            "context": rng.integers(0, 64, n * H).tolist(),
            "top_k": 5,
        }

    return app, gen_payload


async def drive(client, gen_payload, n_requests, rate_hz, concurrency):
    rng = np.random.default_rng(0)
    # warmup: compile the engine executables outside the timed window
    wpath, wpayload = gen_payload(np.random.default_rng(1))
    try:
        await client.post(wpath, json=wpayload)
    except Exception:
        pass
    sem = asyncio.Semaphore(concurrency)
    lat = []
    errors = {}

    async def one(path, payload):
        async with sem:
            t0 = time.perf_counter()
            try:
                r = await client.post(path, json=payload)
                await r.json()
                if r.status != 200:
                    errors[r.status] = errors.get(r.status, 0) + 1
                    return
            except Exception as e:
                errors[type(e).__name__] = (
                    errors.get(type(e).__name__, 0) + 1
                )
                return
            lat.append(time.perf_counter() - t0)

    t_start = time.perf_counter()
    tasks = []
    for _ in range(n_requests):
        path, payload = gen_payload(rng)
        tasks.append(asyncio.get_event_loop().create_task(
            one(path, payload)
        ))
        # Poisson-ish arrivals at rate_hz
        await asyncio.sleep(float(rng.exponential(1.0 / rate_hz)))
    await asyncio.gather(*tasks)
    wall = time.perf_counter() - t_start
    lat_ms = sorted(x * 1e3 for x in lat)

    def pct(p):
        return round(lat_ms[min(len(lat_ms) - 1,
                                int(p * len(lat_ms)))], 2) if lat_ms else None

    return {
        "completed": len(lat),
        "errors": errors,
        "wall_s": round(wall, 2),
        "throughput_rps": round(len(lat) / wall, 2),
        "latency_ms": {"p50": pct(0.5), "p90": pct(0.9), "p99": pct(0.99)},
    }


async def run_inprocess(kind, n_requests, rate_hz, concurrency):
    from aiohttp.test_utils import TestClient, TestServer

    app, gen_payload = (
        build_ranking_app() if kind == "ranking" else build_sid_app()
    )
    async with TestClient(TestServer(app)) as client:
        return await drive(
            client, gen_payload, n_requests, rate_hz, concurrency
        )


async def run_url(url, endpoint, n_requests, rate_hz, concurrency):
    import aiohttp

    rng = np.random.default_rng(0)

    def gen_payload(_rng):
        n = int(_rng.integers(4, 28))
        return endpoint, {
            "user_id": int(_rng.integers(0, 64)),
            "item_ids": _rng.integers(1, 9999, n).tolist(),
            "num_candidates": 2,
        }

    async with aiohttp.ClientSession(base_url=url) as client:
        return await drive(
            client, gen_payload, n_requests, rate_hz, concurrency
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default=None)
    ap.add_argument("--endpoint", default="/predict")
    ap.add_argument("--inprocess", choices=("ranking", "sid"), default=None)
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--rate", type=float, default=50.0)
    ap.add_argument("--concurrency", type=int, default=16)
    args = ap.parse_args()
    if not args.url and not args.inprocess:
        ap.error("need --url or --inprocess")
    if args.inprocess:
        out = asyncio.run(run_inprocess(
            args.inprocess, args.requests, args.rate, args.concurrency
        ))
        out["target"] = f"inprocess:{args.inprocess}"
    else:
        out = asyncio.run(run_url(
            args.url, args.endpoint, args.requests, args.rate,
            args.concurrency,
        ))
        out["target"] = args.url
    import jax

    out["bench"] = "http_loadgen"
    out["backend"] = jax.default_backend()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
