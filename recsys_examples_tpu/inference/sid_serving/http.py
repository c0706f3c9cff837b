"""HTTP /generate serving front-end (SGLang-compatible payload).

Counterpart of the reference HTTP adapter
(examples/sid-gr-inference/src/gr_inference/gr_serving/http.py:88
`GRHTTPServingAdapter`, SGLang payload translation :549).

Endpoints:
  POST /generate  {"input_ids": [...], "sampling_params": {"top_k": 10}}
                  -> {"sids": [[...], ...], "scores": [...]}
  GET  /health, /metrics
"""
from __future__ import annotations

import asyncio
import json
from typing import Optional

import numpy as np

from recsys_examples_tpu.inference.sid_serving.scheduler import (
    GRContinuousScheduler,
)


def create_app(scheduler: GRContinuousScheduler):
    from aiohttp import web

    tick_task = None

    def _has_work():
        if scheduler.queue:
            return True
        return bool(getattr(scheduler, "inflight", ()))

    async def ticker(app):
        # works with both the batch scheduler (GRContinuousScheduler) and
        # the stepwise ContinuousGRScheduler (continuous.py) — the latter
        # must keep ticking while requests are in flight
        while True:
            if _has_work():
                await asyncio.get_event_loop().run_in_executor(
                    None, scheduler.tick
                )
            else:
                await asyncio.sleep(0.002)

    async def on_startup(app):
        nonlocal tick_task
        tick_task = asyncio.create_task(ticker(app))

    async def on_cleanup(app):
        if tick_task:
            tick_task.cancel()

    async def generate(request):
        body = await request.json()
        # SGLang-style: input_ids (flat SID context), sampling_params
        input_ids = body.get("input_ids") or body.get("context") or []
        top_k = int(
            (body.get("sampling_params") or {}).get("top_k", body.get("top_k", 10))
        )
        rid = scheduler.submit(np.asarray(input_ids, np.int32), top_k=top_k)
        # poll for completion
        for _ in range(int(scheduler.request_timeout_s / 0.005)):
            res = scheduler.get_result(rid)
            if res is not None:
                if "error" in res:
                    return web.json_response(res, status=504)
                return web.json_response(res)
            await asyncio.sleep(0.005)
        return web.json_response({"error": "timeout"}, status=504)

    async def health(request):
        return web.json_response({"status": "ok"})

    async def metrics(request):
        # stepwise scheduler exposes the richer counters/utilization split
        # (reference status()/metrics() split); fall back to status()
        fn = getattr(scheduler, "get_metrics", scheduler.status)
        return web.json_response(fn())

    app = web.Application()
    app.router.add_post("/generate", generate)
    app.router.add_get("/health", health)
    app.router.add_get("/metrics", metrics)
    app.on_startup.append(on_startup)
    app.on_cleanup.append(on_cleanup)
    return app


def serve(scheduler: GRContinuousScheduler, host="0.0.0.0", port=30000):
    from aiohttp import web

    web.run_app(create_app(scheduler), host=host, port=port)
