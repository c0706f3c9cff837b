"""Dynamic embedding lookup/insert throughput.

Counterpart of the reference's DynamicEmb benchmark
(corelib/dynamicemb/benchmark/README.md — fused tables, dedup on/off,
global batch 65536).

Usage: python benchmarks/benchmark_dynamicemb.py
"""
import json
import time

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from recsys_examples_tpu.utils.backend import honor_platform_env  # noqa: E402

honor_platform_env()

import jax
import jax.numpy as jnp
import numpy as np

from recsys_examples_tpu.dynamicemb.batched_table import DynamicEmbeddingTable
from recsys_examples_tpu.dynamicemb.dynamicemb_config import (
    DynamicEmbTableOptions,
)
from recsys_examples_tpu.dynamicemb.optimizer import SparseOptimizerArgs
from recsys_examples_tpu.dynamicemb.unique_op import segmented_unique


def main():
    on_tpu = jax.default_backend() == "tpu"
    n_ids = 65536 if on_tpu else 2048
    dim = 128
    cap = (1 << 22) if on_tpu else (1 << 14)
    tbl = DynamicEmbeddingTable(
        DynamicEmbTableOptions(
            embedding_dim=dim, max_capacity=cap, bucket_capacity=128
        ),
        SparseOptimizerArgs(optimizer="rowwise_adagrad", learning_rate=0.01),
    )
    state = tbl.init_state()
    rng = np.random.default_rng(0)

    @jax.jit
    def step(state, ids):
        uk, rev, _, nu = segmented_unique(ids)
        state, slots, emb = tbl.forward_train(state, uk)
        out = emb[rev]
        state = tbl.backward(state, slots, jnp.ones_like(emb))
        return state, out.sum()

    def batch(i):
        # zipf-ish skewed id distribution
        return jnp.asarray(
            rng.zipf(1.1, n_ids).astype(np.int64) % (cap * 4)
        )

    state, s = step(state, batch(0))
    jax.block_until_ready(s)
    iters = 20 if on_tpu else 3
    t0 = time.perf_counter()
    for i in range(iters):
        state, s = step(state, batch(i))
    jax.block_until_ready(s)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "bench": "dynamicemb_fwd_bwd",
        "ids_per_step": n_ids,
        "dim": dim,
        "capacity": cap,
        "step_ms": round(dt * 1e3, 3),
        "lookups_per_s": round(n_ids / dt),
    }))

    # ---- pooled (bag) path: SUM pooling over jagged bags
    from recsys_examples_tpu.dynamicemb.pooled import (
        PooledDynamicEmbedding, PoolingMode,
    )
    from recsys_examples_tpu.dynamicemb.sharded_collection import (
        ShardedDynamicEmbedding,
    )

    B = 2048 if on_tpu else 64
    per_bag = n_ids // B
    offsets = jnp.asarray(
        np.arange(B + 1, dtype=np.int32) * per_bag
    )
    pe = PooledDynamicEmbedding(
        ShardedDynamicEmbedding(tbl, mesh=None), mode=PoolingMode.SUM
    )
    pstate = pe.init_state()

    @jax.jit
    def pstep(state, ids):
        state, pooled, res = pe.forward(state, ids, offsets, train=True)
        state = pe.backward(state, res, jnp.ones_like(pooled))
        return state, pooled.sum()

    pstate, s = pstep(pstate, batch(0))
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for i in range(iters):
        pstate, s = pstep(pstate, batch(i))
    jax.block_until_ready(s)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "bench": "dynamicemb_pooled_fwd_bwd",
        "ids_per_step": n_ids,
        "bags": B,
        "dim": dim,
        "step_ms": round(dt * 1e3, 3),
        "lookups_per_s": round(n_ids / dt),
    }))


if __name__ == "__main__":
    main()
