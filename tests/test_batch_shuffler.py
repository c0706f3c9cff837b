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


def test_native_matches_python():
    rng = np.random.default_rng(1)
    costs = rng.random(48) * 100
    a_native, l_native = bs.karmarkar_karp(costs, 4)
    # force python fallback
    saved = bs._NATIVE
    bs._NATIVE = None
    try:
        a_py, l_py = bs.karmarkar_karp(costs, 4)
    finally:
        bs._NATIVE = saved
    # identical greedy algorithm -> identical loads
    np.testing.assert_allclose(np.sort(l_native), np.sort(l_py), rtol=1e-9)


def test_balanced_permutation_improves_balance():
    rng = np.random.default_rng(2)
    seqlen = np.minimum(rng.zipf(1.2, 32) * 50, 4000)
    stats = bs.balance_stats(seqlen, 8)
    assert stats["balanced_max_over_mean"] <= stats["naive_max_over_mean"] + 1e-9
    perm = bs.balanced_permutation(seqlen, 8)
    assert sorted(perm.tolist()) == list(range(32))
