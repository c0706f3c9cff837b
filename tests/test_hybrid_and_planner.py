"""Hybrid storage prefetch/flush, planner, exportable tables, checkpoint."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recsys_examples_tpu.dynamicemb.batched_table import DynamicEmbeddingTable
from recsys_examples_tpu.dynamicemb.dynamicemb_config import (
    DynamicEmbInitializerArgs,
    DynamicEmbInitializerMode,
    DynamicEmbTableOptions,
)
from recsys_examples_tpu.dynamicemb.exportable_tables import (
    freeze_table,
    inference_lookup,
)
from recsys_examples_tpu.dynamicemb.hybrid_storage import (
    HybridDynamicEmbedding,
)
from recsys_examples_tpu.dynamicemb.optimizer import SparseOptimizerArgs
from recsys_examples_tpu.dynamicemb.planner import (
    DistType,
    DynamicEmbeddingShardingPlanner,
)
from recsys_examples_tpu.training.checkpoint import dump_table, load_table


def _table(capacity=64, bucket=8):
    opts = DynamicEmbTableOptions(
        embedding_dim=4,
        max_capacity=capacity,
        bucket_capacity=bucket,
        initializer_args=DynamicEmbInitializerArgs(
            mode=DynamicEmbInitializerMode.DEBUG
        ),
    )
    return DynamicEmbeddingTable(
        opts, SparseOptimizerArgs(optimizer="sgd", learning_rate=0.1)
    )


def test_hybrid_prefetch_and_flush():
    tbl = _table(capacity=16, bucket=8)  # tiny device tier
    hyb = HybridDynamicEmbedding(tbl)
    state = hyb.init_state()
    # train on keys 0..15 (fills device tier)
    keys1 = jnp.arange(16, dtype=jnp.int64)
    state, slots, emb = tbl.forward_train(state, keys1)
    # flush everything to host (some keys may have overflowed their
    # bucket at insert — flush exactly what the device table holds)
    from recsys_examples_tpu.dynamicemb.hashtable import table_size
    stored = int(table_size(state.table))
    hyb.flush_all(state)
    assert len(hyb.host) == stored >= 14
    # new working set evicts old keys on-device
    keys2 = jnp.arange(100, 116, dtype=jnp.int64)
    state, _, _ = tbl.forward_train(state, keys2)
    # prefetch the ORIGINAL keys back from host: must restore their rows
    state = hyb.prefetch(state, np.arange(4, dtype=np.int64))
    ev = tbl.forward_eval(state, jnp.arange(4, dtype=jnp.int64))
    expect = np.tile((np.arange(4) % 100000) / 100000.0, (4, 1)).T
    np.testing.assert_allclose(np.asarray(ev), expect, rtol=1e-5)


def test_planner_plan_and_report():
    planner = DynamicEmbeddingShardingPlanner(world_size=4)
    plan, modules = planner.plan(
        {
            "item": DynamicEmbTableOptions(
                embedding_dim=16, max_capacity=1000, bucket_capacity=64
            ),
            "user": DynamicEmbTableOptions(
                embedding_dim=16, max_capacity=500, bucket_capacity=64
            ),
        },
        SparseOptimizerArgs(optimizer="adam"),
        dist_type=DistType.ROUNDROBIN,
    )
    assert set(modules) == {"item", "user"}
    # capacity per shard: >= ceil(1024/4)=256, bucket aligned
    assert modules["item"].capacity % 64 == 0
    assert modules["item"].capacity * 4 >= 1000
    # planner filled uniform bounds to +-1/sqrt(dim)
    init = plan.entries["item"].options.initializer_args
    assert init.upper == pytest.approx(0.25)
    rep = plan.memory_report()
    assert "TOTAL" in rep and "item" in rep


def test_freeze_and_inference_lookup():
    tbl = _table()
    state = tbl.init_state()
    keys = jnp.asarray([3, 9, 27], jnp.int64)
    state, _, emb = tbl.forward_train(state, keys)
    frozen = freeze_table(tbl, state)
    out = inference_lookup(frozen, jnp.asarray([3, 9, 27, 999], jnp.int64))
    np.testing.assert_allclose(
        np.asarray(out[:3]), np.asarray(emb), rtol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(out[3]), 0)


def test_dump_load_roundtrip(tmp_path):
    tbl = _table()
    state = tbl.init_state()
    keys = jnp.asarray([11, 22, 33, 44], jnp.int64)
    state, slots, emb = tbl.forward_train(state, keys)
    n = dump_table(str(tmp_path), "t", state)
    assert n == 4
    # reload into a fresh (different-size) table: world-size agnostic
    tbl2 = _table(capacity=128, bucket=16)
    st2 = tbl2.init_state()
    st2 = load_table(str(tmp_path), "t", tbl2, st2, batch=2)
    ev = tbl2.forward_eval(st2, keys)
    np.testing.assert_allclose(np.asarray(ev), np.asarray(emb), rtol=1e-6)
    # incremental dump by score threshold: nothing qualifies above max score
    n2 = dump_table(str(tmp_path), "t2", state, score_threshold=10**9)
    assert n2 == 0
