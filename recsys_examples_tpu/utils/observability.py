"""Tracing / profiling / counters.

Counterpart of the reference's observability utilities:
  - named scopes in place of NVTX ranges (commons/utils/nvtx_op.py,
    ENABLE_NVTX_HOOKS) -> jax.named_scope shows up in xprof traces
  - GPUTimer (commons/utils/gpu_timer.py) -> DeviceTimer via
    block_until_ready boundaries
  - attention perf tracker (commons/utils/attn_perf_tracker.py,
    PRINT_HSTU_PERF) -> AttnPerfTracker
  - dynamicemb cache stats auto-install
    (commons/utils/dynamicemb_cache_stats.py) -> table_stats
  - profiler window (trainer/training.py:178 torch.cuda.profiler window)
    -> profiler_window ctx manager around jax.profiler
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Optional

import jax
import numpy as np

ENABLE_SCOPE_HOOKS = os.environ.get("ENABLE_SCOPE_HOOKS", "0") == "1"
PRINT_HSTU_PERF = os.environ.get("PRINT_HSTU_PERF", "0") == "1"


def named_scope(name: str):
    """NVTX-range equivalent; no-op cost when not profiling."""
    return jax.named_scope(name)


@contextlib.contextmanager
def profiler_window(out_dir: str = "/tmp/rextpu_trace"):
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class DeviceTimer:
    """Wall-clock timing at device boundaries (GPUTimer equivalent):
    timing windows end with block_until_ready on the watched outputs."""

    def __init__(self):
        self.records: Dict[str, list] = {}

    @contextlib.contextmanager
    def time(self, name: str, *outputs):
        t0 = time.perf_counter()
        yield
        for o in outputs:
            jax.block_until_ready(o)
        self.records.setdefault(name, []).append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, float]:
        return {
            k: float(np.median(v)) * 1e3 for k, v in self.records.items()
        }


class AttnPerfTracker:
    """Per-call attention FLOPs/latency log (PRINT_HSTU_PERF equivalent)."""

    def __init__(self, peak_tflops: float):
        self.peak = peak_tflops
        self.calls = []

    def record(self, seqlens: np.ndarray, heads: int, dim: int, dt_s: float):
        fl = float((2.0 * 2.0 * heads * dim * (seqlens.astype(np.float64) ** 2) / 2).sum())
        tflops = fl / dt_s / 1e12
        self.calls.append((dt_s, tflops))
        if PRINT_HSTU_PERF:
            print(
                f"[attn] {dt_s * 1e3:.2f} ms  {tflops:.1f} TFLOPS "
                f"({100 * tflops / self.peak:.1f}% MFU)"
            )


def table_stats(state) -> Dict[str, int]:
    """Dynamic-embedding table counters (cache-stats equivalent)."""
    from recsys_examples_tpu.dynamicemb.hashtable import table_size

    return {
        "size": int(table_size(state.table)),
        "capacity": state.table.capacity,
        "inserted": int(np.asarray(state.table.inserted)[0]),
        "evicted": int(np.asarray(state.table.evicted)[0]),
        "overflowed": int(np.asarray(state.table.overflowed)[0]),
    }
