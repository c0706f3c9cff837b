"""Balanced batch shuffler / KK partitioner tests (native + fallback)."""
import numpy as np
import pytest

from recsys_examples_tpu.data import batch_shuffler as bs


def test_kk_partition_balances():
    rng = np.random.default_rng(0)
    costs = rng.zipf(1.3, 64).astype(np.float64) ** 2
    assign, loads = bs.karmarkar_karp(costs, 8)
    assert assign.shape == (64,)
    assert set(np.unique(assign)) <= set(range(8))
    counts = np.bincount(assign, minlength=8)
    assert counts.max() == 8 and counts.min() == 8  # equal cardinality
    # balanced loads beat the naive contiguous split
    naive = costs.reshape(8, 8).sum(axis=1)
    assert loads.max() <= naive.max() + 1e-9
    np.testing.assert_allclose(loads.sum(), costs.sum(), rtol=1e-9)


@pytest.mark.skipif(bs._load_native() is None, reason="native .so not built")
def test_best_partition_beats_both_on_zipf():
    """The default 'best' mode must never lose to either KK or capped LPT
    on max-load for heavy-tailed Zipf(1.2) attention costs. (Measured:
    capped LPT beats the reference's equal-size KK on this load shape —
    see karmarkar_karp docstring — so 'best' usually picks LPT.)"""
    for seed in range(20):
        rng = np.random.default_rng(seed)
        seqlen = np.minimum(rng.zipf(1.2, 256), 4096).astype(np.float64)
        costs = bs.hstu_sample_cost(seqlen)
        _, kk_loads = bs.karmarkar_karp(costs, 8, method="kk")
        _, lpt_loads = bs.karmarkar_karp(costs, 8, method="lpt")
        _, best_loads = bs.karmarkar_karp(costs, 8, method="best")
        assert best_loads.max() <= kk_loads.max() + 1e-6, seed
        assert best_loads.max() <= lpt_loads.max() + 1e-6, seed


@pytest.mark.skipif(bs._load_native() is None, reason="native .so not built")
@pytest.mark.skipif(
    not __import__("os").path.exists(
        "/root/reference/examples/commons/perf_model/partitioner.py"
    ),
    reason="reference tree not mounted",
)
def test_kk_matches_reference_python_twin():
    """The native KK core reproduces the reference's pure-Python
    Karmarkar-Karp (perf_model/partitioner.py:120) load-for-load — same
    seeding, merge pairing, and tie-breaking."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "refpart",
        "/root/reference/examples/commons/perf_model/partitioner.py",
    )
    m = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(m)
    except Exception as e:  # torch-less env etc.
        pytest.skip(f"reference partitioner unimportable: {e}")
    for seed in range(5):
        rng = np.random.default_rng(seed)
        w = np.minimum(rng.zipf(1.2, 64), 4096).astype(np.int64)
        costs = (w * w + 8 * w).astype(np.float64)
        parts = m._karmarkar_karp_python(
            [int(c) for c in costs], 8, True
        )
        ref_loads = sorted(sum(int(costs[i]) for i in p) for p in parts)
        _, loads = bs.karmarkar_karp(costs, 8, method="kk")
        assert ref_loads == sorted(int(round(x)) for x in loads), seed


@pytest.mark.skipif(bs._load_native() is None, reason="native .so not built")
def test_kk_nondivisible_batch():
    rng = np.random.default_rng(3)
    costs = rng.zipf(1.3, 61).astype(np.float64) ** 2
    assign, loads = bs.karmarkar_karp(costs, 8)
    assert assign.shape == (61,)
    counts = np.bincount(assign, minlength=8)
    assert counts.max() <= 8  # ceil(61/8)
    np.testing.assert_allclose(loads.sum(), costs.sum(), rtol=1e-9)


def test_native_lpt_matches_python():
    rng = np.random.default_rng(1)
    costs = rng.random(48) * 100
    a_native, l_native = bs.karmarkar_karp(costs, 4, method="lpt")
    # force python fallback (which implements the same greedy LPT)
    saved = bs._NATIVE
    bs._NATIVE = None
    try:
        a_py, l_py = bs.karmarkar_karp(costs, 4)
    finally:
        bs._NATIVE = saved
    np.testing.assert_allclose(np.sort(l_native), np.sort(l_py), rtol=1e-9)


def test_balanced_permutation_improves_balance():
    rng = np.random.default_rng(2)
    seqlen = np.minimum(rng.zipf(1.2, 32) * 50, 4000)
    stats = bs.balance_stats(seqlen, 8)
    assert stats["balanced_max_over_mean"] <= stats["naive_max_over_mean"] + 1e-9
    perm = bs.balanced_permutation(seqlen, 8)
    assert sorted(perm.tolist()) == list(range(32))


def test_shuffle_reorders_timestamps_with_items():
    """Timestamps are jagged-aligned with item values; the balanced
    shuffle must apply the SAME permutation (previously passed through
    unreordered -> wrong per-token timestamps after shuffling)."""
    import dataclasses

    import jax.numpy as jnp

    from recsys_examples_tpu.data.hstu_batch import random_hstu_batch

    b = random_hstu_batch(
        seed=3, batch_size=8, max_history_len=32, item_vocab=1000,
        max_num_candidates=0, num_tasks=1,
    )
    item = b.features["item"]
    total = int(np.asarray(item.lengths).sum())
    # timestamp = its item value, so alignment is directly checkable
    ts = np.zeros(np.asarray(item.values).shape[0], np.int64)
    ts[:total] = np.asarray(item.values)[:total]
    b = dataclasses.replace(b, timestamps=jnp.asarray(ts))
    out = bs.shuffle_hstu_batch(b, num_parts=4)
    ov = np.asarray(out.features["item"].values)
    ot = np.asarray(out.timestamps)
    ol = np.asarray(out.features["item"].lengths)
    n = int(ol.sum())
    np.testing.assert_array_equal(ot[:n], ov[:n])
