"""Streaming eval metrics: AUC (ranking), HR@k / NDCG@k / MRR (retrieval).

Counterpart of the reference metric modules
(examples/hstu/modules/metrics/metric_modules.py:72-310). Implemented as
functional accumulator states (pytrees) so they jit and psum across a mesh —
the DP-group sync the reference gets from torchmetrics falls out of a psum.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class AUCState:
    """Histogram-bucketed streaming AUC per task (fixed bucket count keeps
    state O(buckets), mergeable with a sum — psum-friendly)."""

    pos_hist: jax.Array  # [num_tasks, buckets]
    neg_hist: jax.Array

    @staticmethod
    def init(num_tasks: int, buckets: int = 4096) -> "AUCState":
        z = jnp.zeros((num_tasks, buckets), jnp.float32)
        return AUCState(pos_hist=z, neg_hist=z)


def auc_update(
    state: AUCState,
    logits: jax.Array,   # [N, num_tasks]
    labels01: jax.Array, # [N, num_tasks] 0/1
    valid: jax.Array,    # [N] bool
) -> AUCState:
    buckets = state.pos_hist.shape[1]
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    idx = jnp.clip((p * buckets).astype(jnp.int32), 0, buckets - 1)  # [N, T]
    v = valid[:, None].astype(jnp.float32)
    y = labels01.astype(jnp.float32)
    num_tasks = state.pos_hist.shape[0]

    def one_task(t):
        pos = jnp.zeros((buckets,), jnp.float32).at[idx[:, t]].add(y[:, t] * v[:, 0])
        neg = jnp.zeros((buckets,), jnp.float32).at[idx[:, t]].add(
            (1.0 - y[:, t]) * v[:, 0]
        )
        return pos, neg

    pos, neg = jax.vmap(one_task)(jnp.arange(num_tasks))
    return AUCState(pos_hist=state.pos_hist + pos, neg_hist=state.neg_hist + neg)


def auc_compute(state: AUCState) -> jax.Array:
    """[num_tasks] AUC from histograms (trapezoidal over score buckets)."""
    pos = state.pos_hist
    neg = state.neg_hist
    total_pos = pos.sum(axis=1, keepdims=True)
    total_neg = neg.sum(axis=1, keepdims=True)
    # P(score_pos > score_neg) + 0.5 P(equal), bucketed
    neg_cum_below = jnp.cumsum(neg, axis=1) - neg
    auc = (pos * (neg_cum_below + 0.5 * neg)).sum(axis=1)
    denom = (total_pos * total_neg)[:, 0]
    return jnp.where(denom > 0, auc / jnp.maximum(denom, 1.0), 0.5)


@struct.dataclass
class RetrievalMetricState:
    """Accumulators for HR@k / NDCG@k / MRR over ranked candidate lists."""

    hit: jax.Array     # [num_ks]
    ndcg: jax.Array    # [num_ks]
    mrr: jax.Array     # []
    count: jax.Array   # []

    @staticmethod
    def init(num_ks: int) -> "RetrievalMetricState":
        return RetrievalMetricState(
            hit=jnp.zeros((num_ks,), jnp.float32),
            ndcg=jnp.zeros((num_ks,), jnp.float32),
            mrr=jnp.zeros((), jnp.float32),
            count=jnp.zeros((), jnp.float32),
        )


def retrieval_update(
    state: RetrievalMetricState,
    rank: jax.Array,    # [N] 1-based rank of the true item (0/huge = miss)
    valid: jax.Array,   # [N] bool
    ks: Tuple[int, ...],
) -> RetrievalMetricState:
    v = valid.astype(jnp.float32)
    r = rank.astype(jnp.float32)
    hits = []
    ndcgs = []
    for k in ks:
        h = ((rank >= 1) & (rank <= k)).astype(jnp.float32) * v
        hits.append(h.sum())
        ndcgs.append((h / jnp.log2(r + 1.0)).sum())
    mrr = jnp.where(rank >= 1, 1.0 / jnp.maximum(r, 1.0), 0.0) * v
    return RetrievalMetricState(
        hit=state.hit + jnp.stack(hits),
        ndcg=state.ndcg + jnp.stack(ndcgs),
        mrr=state.mrr + mrr.sum(),
        count=state.count + v.sum(),
    )


def retrieval_compute(
    state: RetrievalMetricState, ks: Tuple[int, ...]
) -> Dict[str, jax.Array]:
    c = jnp.maximum(state.count, 1.0)
    out = {}
    for i, k in enumerate(ks):
        out[f"HR@{k}"] = state.hit[i] / c
        out[f"NDCG@{k}"] = state.ndcg[i] / c
    out["MRR"] = state.mrr / c
    return out
