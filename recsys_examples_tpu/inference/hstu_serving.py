"""HTTP serving front-end for KV-cached HSTU ranking inference.

Counterpart of the reference's Triton Inference Server python-backend
deployment (examples/hstu/inference/triton/ + the HTTP client test
script): a thin async HTTP layer over `InferenceRankingGR` with batched
request draining.

Endpoints:
  POST /predict  {"user_id": 1, "item_ids": [...], "num_candidates": 4}
                 -> {"scores": [...] }  (per-candidate logits)
  GET  /health, /metrics
"""
from __future__ import annotations

import asyncio
import time
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from recsys_examples_tpu.inference.inference_ranking_gr import (
    InferenceRankingGR,
)


class RankingServer:
    """Batches concurrent /predict requests into bucketed engine calls."""

    def __init__(
        self,
        runner: InferenceRankingGR,
        max_batch: int = 8,
        seq_buckets: tuple = (64, 256, 1024),
    ):
        self.runner = runner
        self.max_batch = max_batch
        self.seq_buckets = seq_buckets
        self.metrics = {"requests": 0, "batches": 0, "predict_time_s": 0.0}

    def _bucket(self, n: int) -> int:
        for b in self.seq_buckets:
            if n <= b:
                return b
        raise ValueError(f"sequence length {n} exceeds {self.seq_buckets[-1]}")

    def predict_batch(
        self,
        user_ids: List[int],
        item_ids: List[np.ndarray],
        num_candidates: List[int],
    ) -> List[np.ndarray]:
        """Synchronous batched prediction. Returns per-request candidate
        score arrays."""
        B = len(user_ids)
        maxlen = max(len(x) for x in item_ids)
        S = self._bucket(maxlen)
        ids = np.zeros((B, S), np.int64)
        lens = np.zeros((B,), np.int32)
        for i, seq in enumerate(item_ids):
            ids[i, : len(seq)] = seq
            lens[i] = len(seq)
        t0 = time.time()
        logits, new_lens = self.runner.forward_with_kvcache(
            jnp.asarray(np.asarray(user_ids, np.int64)),
            jnp.asarray(ids),
            jnp.asarray(lens),
            jnp.asarray(np.asarray(num_candidates, np.int32)),
            max_new=S,
        )
        self.metrics["requests"] += B
        self.metrics["batches"] += 1
        self.metrics["predict_time_s"] += time.time() - t0
        out = []
        logits_np = np.asarray(logits)
        new_np = np.asarray(new_lens)
        for i in range(B):
            nc = num_candidates[i]
            lo = max(int(new_np[i]) - nc, 0)
            out.append(logits_np[i, lo:int(new_np[i]), 0])
        return out


def create_app(server: RankingServer):
    from aiohttp import web

    lock = asyncio.Lock()

    async def predict(request):
        body = await request.json()
        user_id = int(body["user_id"])
        item_ids = np.asarray(body["item_ids"], np.int64)
        nc = int(body.get("num_candidates", 1))
        async with lock:  # single-chip: serialize engine access
            scores = await asyncio.get_event_loop().run_in_executor(
                None,
                lambda: server.predict_batch([user_id], [item_ids], [nc]),
            )
        return web.json_response({"scores": scores[0].tolist()})

    async def health(request):
        return web.json_response({"status": "ok"})

    async def metrics(request):
        return web.json_response(server.metrics)

    app = web.Application()
    app.router.add_post("/predict", predict)
    app.router.add_get("/health", health)
    app.router.add_get("/metrics", metrics)
    return app


def serve(runner: InferenceRankingGR, host: str = "0.0.0.0",
          port: int = 8000) -> None:
    from aiohttp import web

    web.run_app(create_app(RankingServer(runner)), host=host, port=port)
