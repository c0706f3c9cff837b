"""End-to-end KV-cached ranking inference: second call must reuse cache and
match from-scratch results (reference: inference_gr_ranking flow)."""
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
from recsys_examples_tpu.dynamicemb.exportable_tables import freeze_table
from recsys_examples_tpu.dynamicemb.optimizer import SparseOptimizerArgs
from recsys_examples_tpu.inference.inference_ranking_gr import (
    InferenceDenseModule,
    InferenceRankingGR,
)
from recsys_examples_tpu.inference.kvcache import KVCacheConfig, lookup_kvcache
from recsys_examples_tpu.modules.config import HSTUConfig, KernelBackend

CFG = HSTUConfig(
    hidden_size=16,
    num_layers=2,
    num_attention_heads=2,
    kv_channels=8,
    hidden_dropout=0.0,
    kernel_backend=KernelBackend.JNP,
    dtype=jnp.float32,
)
KV_CFG = KVCacheConfig(
    num_layers=2, num_heads=2, head_dim=8, page_size=4,
    num_pages=64, max_users=8, max_pages_per_user=8, dtype=jnp.float32,
)


def _build():
    tbl = DynamicEmbeddingTable(
        DynamicEmbTableOptions(
            embedding_dim=16, max_capacity=256, bucket_capacity=16,
            initializer_args=DynamicEmbInitializerArgs(
                mode=DynamicEmbInitializerMode.NORMAL, std_dev=0.3
            ),
        ),
        SparseOptimizerArgs(optimizer="sgd"),
    )
    st = tbl.init_state()
    st, _, _ = tbl.forward_train(st, jnp.arange(1, 100, dtype=jnp.int64))
    frozen = freeze_table(tbl, st)
    mod = InferenceDenseModule(CFG, head_arch=(8, 1))
    B, S = 2, 8
    x = jnp.zeros((B, S, 16), jnp.float32)
    ck = jnp.zeros((2, B, 0, 2, 8), jnp.float32)
    params = mod.init(
        jax.random.PRNGKey(0), x, ck, ck, jnp.zeros((B,), jnp.int32),
        jnp.full((B,), S, jnp.int32), None, 32,
    )["params"]
    runner = InferenceRankingGR(
        config=CFG, kv_config=KV_CFG, dense_params=params,
        item_table=frozen, head_arch=(8, 1),
    )
    runner.init_cache()
    return runner


def test_cached_inference_matches_fresh():
    runner = _build()
    users = jnp.asarray([101, 202], jnp.int64)
    rng = np.random.default_rng(0)
    seq = jnp.asarray(rng.integers(1, 99, size=(2, 12)), jnp.int64)
    ncand = jnp.asarray([2, 2], jnp.int32)

    # call 1: 8 tokens (6 hist + 2 cand), nothing cached
    l1 = jnp.asarray([8, 8], jnp.int32)
    logits1, new1 = runner.forward_with_kvcache(users, seq, l1, ncand, 8)
    np.testing.assert_array_equal(np.asarray(new1), [8, 8])
    _, cached = lookup_kvcache(runner.kv_state, users)
    np.testing.assert_array_equal(np.asarray(cached), [6, 6])  # hist only

    # call 2: sequence extended to 12 tokens -> only 6 new computed
    l2 = jnp.asarray([12, 12], jnp.int32)
    logits2, new2 = runner.forward_with_kvcache(users, seq, l2, ncand, 8)
    np.testing.assert_array_equal(np.asarray(new2), [6, 6])

    # fresh runner, same 12-token input from scratch: results must match
    fresh = _build()
    fresh.dense_params = runner.dense_params
    logits_ref, _ = fresh.forward_with_kvcache(
        users, seq, l2, ncand, 12
    )
    # compare the candidate positions: last 2 new tokens of call 2 vs
    # last 2 of the fresh 12-token run
    np.testing.assert_allclose(
        np.asarray(logits2[:, 4:6]), np.asarray(logits_ref[:, 10:12]),
        rtol=1e-4, atol=1e-5,
    )


def test_paged_kernel_path_matches_gather_path():
    """The paged-pool attention path must equal the dense gather path."""
    users = jnp.asarray([7, 8], jnp.int64)
    rng = np.random.default_rng(1)
    seq = jnp.asarray(rng.integers(1, 99, size=(2, 12)), jnp.int64)
    ncand = jnp.asarray([2, 2], jnp.int32)
    l1 = jnp.asarray([8, 8], jnp.int32)
    l2 = jnp.asarray([12, 12], jnp.int32)

    r_gather = _build()
    r_paged = _build()
    r_paged.dense_params = r_gather.dense_params

    g1, _ = r_gather.forward_with_kvcache(
        users, seq, l1, ncand, 8, use_paged_kernel=False
    )
    p1, _ = r_paged.forward_with_kvcache(
        users, seq, l1, ncand, 8, use_paged_kernel=True
    )
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(p1), rtol=1e-4, atol=1e-5
    )
    g2, _ = r_gather.forward_with_kvcache(
        users, seq, l2, ncand, 8, use_paged_kernel=False
    )
    p2, _ = r_paged.forward_with_kvcache(
        users, seq, l2, ncand, 8, use_paged_kernel=True
    )
    np.testing.assert_allclose(
        np.asarray(g2), np.asarray(p2), rtol=1e-4, atol=1e-5
    )
