"""Continuous scheduler for SID-GR serving.

Counterpart of the reference scheduler
(examples/sid-gr-inference/src/gr_inference/gr_serving/continuous.py:267
`GRContinuousScheduler`: submit/tick/run_until_empty, prefill admission by
memory budget :512, batch planning grouped by context bucket :544, request
timeouts :690, metrics :482; beam policies gr_scheduler/beam_policy.py:126).
"""
from __future__ import annotations

import dataclasses
import time
import uuid
from collections import defaultdict, deque
from typing import Dict, List, Optional

import numpy as np

from recsys_examples_tpu.inference.sid_serving.engine import (
    GRServingEngine,
    ServingConfig,
    _bucket,
)


@dataclasses.dataclass
class GRServingRequest:
    request_id: str
    context: np.ndarray              # flat SID stream
    top_k: int = 10
    submitted_at: float = 0.0
    deadline_s: float = 30.0
    result: Optional[dict] = None
    done: bool = False
    failed: bool = False


@dataclasses.dataclass(frozen=True)
class BeamPolicy:
    """Beam-width policy (reference: beam_policy.py fixed / scheduled /
    score-margin)."""
    kind: str = "fixed"            # fixed | scheduled
    width: int = 64
    schedule: tuple = ()           # per-hierarchy widths when scheduled

    def width_for(self, hierarchy: int) -> int:
        if self.kind == "scheduled" and self.schedule:
            return self.schedule[min(hierarchy, len(self.schedule) - 1)]
        return self.width


class GRContinuousScheduler:
    def __init__(
        self,
        engine: GRServingEngine,
        max_batch: int = 8,
        request_timeout_s: float = 30.0,
    ):
        self.engine = engine
        self.max_batch = max_batch
        self.request_timeout_s = request_timeout_s
        self.queue: deque[GRServingRequest] = deque()
        self.finished: Dict[str, GRServingRequest] = {}
        self.metrics = defaultdict(float)

    # ------------------------------------------------------------ api
    def submit(self, context: np.ndarray, top_k: int = 10) -> str:
        req = GRServingRequest(
            request_id=uuid.uuid4().hex,
            context=np.asarray(context, np.int32),
            top_k=top_k,
            submitted_at=time.time(),
            deadline_s=self.request_timeout_s,
        )
        self.queue.append(req)
        self.metrics["submitted"] += 1
        return req.request_id

    def tick(self) -> int:
        """Process one batch: pop compatible requests (same ctx bucket),
        run generation, fill results. Returns number processed."""
        now = time.time()
        # expire timed-out requests
        alive = deque()
        for r in self.queue:
            if now - r.submitted_at > r.deadline_s:
                r.failed = True
                r.done = True
                r.result = {"error": "timeout"}
                self.finished[r.request_id] = r
                self.metrics["timeouts"] += 1
            else:
                alive.append(r)
        self.queue = alive
        if not self.queue:
            return 0
        # group head-of-line requests by context bucket
        cfg = self.engine.cfg
        head = self.queue[0]
        hb = _bucket(max(len(head.context), 1), cfg.ctx_buckets)
        batch: List[GRServingRequest] = []
        rest = deque()
        budget = cfg.max_batch_tokens
        while self.queue and len(batch) < self.max_batch:
            r = self.queue.popleft()
            rb = _bucket(max(len(r.context), 1), cfg.ctx_buckets)
            if rb == hb and budget >= rb:
                batch.append(r)
                budget -= rb
            else:
                rest.append(r)
        self.queue.extend(rest)

        t0 = time.time()
        paths, scores = self.engine.generate([r.context for r in batch])
        dt = time.time() - t0
        self.metrics["batches"] += 1
        self.metrics["decode_time_s"] += dt
        for i, r in enumerate(batch):
            k = min(r.top_k, paths.shape[1])
            r.result = {
                "sids": paths[i, :k].tolist(),
                "scores": scores[i, :k].tolist(),
                "latency_ms": (time.time() - r.submitted_at) * 1e3,
            }
            r.done = True
            self.finished[r.request_id] = r
            self.metrics["completed"] += 1
        return len(batch)

    def run_until_empty(self, max_ticks: int = 10_000) -> None:
        for _ in range(max_ticks):
            if not self.queue:
                return
            self.tick()

    def get_result(self, request_id: str) -> Optional[dict]:
        r = self.finished.pop(request_id, None)
        return r.result if r else None

    def status(self) -> dict:
        return {
            "queue_depth": len(self.queue),
            "finished": len(self.finished),
            "compiled_buckets": self.engine.compile_count,
            **{k: v for k, v in self.metrics.items()},
        }
