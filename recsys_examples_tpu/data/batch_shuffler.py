"""Workload-balanced DP batch shuffling (host-side).

Counterpart of the reference's balanced shuffler
(examples/commons/distributed/batch_shuffler.py:23 `BatchShuffler`,
perf_model/partitioner.py:85 Karmarkar-Karp + C++ kk_partition,
examples/hstu/utils/hstu_batch_balancer.py workload model) — the reference
exchanges already-on-GPU batches with NCCL all-to-all; on TPU the input
pipeline assembles global batches on the host, so balancing is a pure
numpy re-permutation before device_put: zero device communication.

Cost model: HSTU attention work per sample ~ a*n^2 + b*n (n = tokens after
interleave+contextual), the quadratic term dominating — identical in spirit
to `cal_hstu_flops_single_rank` (examples/commons/utils/perf.py:540).
"""
from __future__ import annotations

import heapq
from typing import Sequence, Tuple

import numpy as np


def hstu_sample_cost(
    seqlen: np.ndarray, hidden: int = 1, heads_x_dim: int = 1
) -> np.ndarray:
    """Per-sample attention+GEMM cost estimate."""
    n = seqlen.astype(np.float64)
    return n * n + 8.0 * n


def _load_native():
    """Native C++ partitioner (csrc/kk_partition.cpp) via ctypes, mirroring
    the reference's C++ KK core (perf_model/csrc/kk_partition.cpp)."""
    import ctypes
    import os

    so = os.path.join(
        os.path.dirname(__file__), "..", "..", "csrc", "libkk_partition.so"
    )
    if not os.path.exists(so):
        return None
    lib = ctypes.CDLL(so)
    lib.kk_partition.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double),
    ]
    return lib


_NATIVE = None
_NATIVE_TRIED = False


def karmarkar_karp(
    costs: np.ndarray, num_parts: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Largest-differencing-method multiway partition.

    Returns (assignment [N] in [0, num_parts), part_loads [num_parts]).
    Greedy LPT refinement of KK for k-way with equal cardinality relaxed;
    the reference additionally constrains equal counts per rank — enforced
    here by a per-part capacity. Uses the native C++ core when built
    (csrc/libkk_partition.so); numpy fallback otherwise.
    """
    global _NATIVE, _NATIVE_TRIED
    if not _NATIVE_TRIED:
        _NATIVE_TRIED = True
        try:
            _NATIVE = _load_native()
        except OSError:
            _NATIVE = None
    if _NATIVE is not None:
        import ctypes

        n = len(costs)
        per = (n + num_parts - 1) // num_parts
        c = np.ascontiguousarray(costs, np.float64)
        assign = np.zeros(n, np.int32)
        loads = np.zeros(num_parts, np.float64)
        _NATIVE.kk_partition(
            c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int64(n), ctypes.c_int32(num_parts),
            ctypes.c_int64(per),
            assign.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            loads.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return assign.astype(np.int64), loads
    n = len(costs)
    per = (n + num_parts - 1) // num_parts
    order = np.argsort(-costs)
    loads = [(0.0, i) for i in range(num_parts)]
    heapq.heapify(loads)
    counts = np.zeros(num_parts, np.int64)
    assign = np.zeros(n, np.int64)
    spill = []
    for idx in order:
        load, part = heapq.heappop(loads)
        while counts[part] >= per:
            spill.append((load, part))
            load, part = heapq.heappop(loads)
        assign[idx] = part
        counts[part] += 1
        heapq.heappush(loads, (load + float(costs[idx]), part))
        for it in spill:
            heapq.heappush(loads, it)
        spill.clear()
    part_loads = np.zeros(num_parts)
    np.add.at(part_loads, assign, costs)
    return assign, part_loads


def balanced_permutation(seqlen: np.ndarray, num_parts: int) -> np.ndarray:
    """Permutation that groups samples into load-balanced contiguous
    DP-rank blocks (rank r gets perm[r*per:(r+1)*per])."""
    costs = hstu_sample_cost(seqlen)
    assign, _ = karmarkar_karp(costs, num_parts)
    perm = np.argsort(assign, kind="stable")
    return perm


def balance_stats(seqlen: np.ndarray, num_parts: int):
    costs = hstu_sample_cost(seqlen)
    assign, loads = karmarkar_karp(costs, num_parts)
    naive = costs.reshape(num_parts, -1).sum(axis=1)
    return {
        "balanced_max_over_mean": float(loads.max() / max(loads.mean(), 1e-9)),
        "naive_max_over_mean": float(naive.max() / max(naive.mean(), 1e-9)),
    }
