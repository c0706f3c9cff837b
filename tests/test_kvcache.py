"""Paged KV cache manager tests (reference test model:
examples/hstu/test inference tests + kvcache manager API)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recsys_examples_tpu.inference.kvcache import (
    HostKVStorage,
    KVCacheConfig,
    allocate_kvcache,
    append_kvcache,
    create_kvcache,
    evict_users,
    gather_kvcache,
    lookup_kvcache,
)

CFG = KVCacheConfig(
    num_layers=2, num_heads=2, head_dim=8, page_size=4,
    num_pages=16, max_users=4, max_pages_per_user=4, dtype=jnp.float32,
)


def _kv(B, S, seed=0):
    rng = np.random.default_rng(seed)
    k = jnp.asarray(rng.standard_normal((2, B, S, 2, 8)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, B, S, 2, 8)).astype(np.float32))
    return k, v


def test_allocate_append_gather_roundtrip():
    st = create_kvcache(CFG)
    users = jnp.asarray([101, 202], jnp.int64)
    lens = jnp.asarray([6, 3], jnp.int32)
    st, slots = allocate_kvcache(st, CFG, users, lens)
    assert (np.asarray(slots) >= 0).all()
    k, v = _kv(2, 6)
    st = append_kvcache(st, CFG, slots, k, v, lens)
    slots2, cached = lookup_kvcache(st, users)
    np.testing.assert_array_equal(np.asarray(cached), [6, 3])
    gk, gv, glen = gather_kvcache(st, CFG, slots2, max_len=8)
    np.testing.assert_allclose(np.asarray(gk[:, 0, :6]), np.asarray(k[:, 0, :6]))
    np.testing.assert_allclose(np.asarray(gv[:, 1, :3]), np.asarray(v[:, 1, :3]))
    np.testing.assert_array_equal(np.asarray(gk[:, 1, 3:]), 0)


def test_append_extends():
    st = create_kvcache(CFG)
    users = jnp.asarray([7], jnp.int64)
    st, slots = allocate_kvcache(st, CFG, users, jnp.asarray([3], jnp.int32))
    k1, v1 = _kv(1, 3, seed=1)
    st = append_kvcache(st, CFG, slots, k1, v1, jnp.asarray([3], jnp.int32))
    # extend by 5 more tokens (crosses page boundary at 4)
    st, slots = allocate_kvcache(st, CFG, users, jnp.asarray([8], jnp.int32))
    k2, v2 = _kv(1, 5, seed=2)
    st = append_kvcache(st, CFG, slots, k2, v2, jnp.asarray([5], jnp.int32))
    _, cached = lookup_kvcache(st, users)
    assert int(cached[0]) == 8
    gk, _, _ = gather_kvcache(st, CFG, slots, max_len=8)
    np.testing.assert_allclose(np.asarray(gk[:, 0, :3]), np.asarray(k1[:, 0]))
    np.testing.assert_allclose(np.asarray(gk[:, 0, 3:8]), np.asarray(k2[:, 0]))


def test_lru_eviction_when_full():
    st = create_kvcache(CFG)
    # fill all 4 user slots, each taking 4 pages (16 pages total)
    for uid in [1, 2, 3, 4]:
        u = jnp.asarray([uid], jnp.int64)
        st, s = allocate_kvcache(st, CFG, u, jnp.asarray([16], jnp.int32))
        k, v = _kv(1, 16, seed=uid)
        st = append_kvcache(st, CFG, s, k, v, jnp.asarray([16], jnp.int32))
    # user 5 needs pages -> must evict LRU (user 1)
    st, s5 = allocate_kvcache(
        st, CFG, jnp.asarray([5], jnp.int64), jnp.asarray([8], jnp.int32)
    )
    assert int(s5[0]) >= 0
    _, c1 = lookup_kvcache(st, jnp.asarray([1], jnp.int64))
    s1, _ = lookup_kvcache(st, jnp.asarray([1], jnp.int64))
    assert int(s1[0]) == -1  # user 1 evicted
    _, c4 = lookup_kvcache(st, jnp.asarray([4], jnp.int64))
    assert int(c4[0]) == 16  # most recent survives


def test_explicit_evict_and_host_offload():
    st = create_kvcache(CFG)
    host = HostKVStorage(CFG)
    u = jnp.asarray([42], jnp.int64)
    st, s = allocate_kvcache(st, CFG, u, jnp.asarray([5], jnp.int32))
    k, v = _kv(1, 5, seed=3)
    st = append_kvcache(st, CFG, s, k, v, jnp.asarray([5], jnp.int32))
    host.offload(st, 42)
    assert host.lookup(42) == 5
    st = evict_users(st, u)
    s2, c2 = lookup_kvcache(st, u)
    assert int(s2[0]) == -1
    # onboard back from host tier
    st = host.onboard(st, 42)
    s3, c3 = lookup_kvcache(st, u)
    assert int(s3[0]) >= 0 and int(c3[0]) == 5
    gk, _, _ = gather_kvcache(st, CFG, s3, max_len=8)
    np.testing.assert_allclose(
        np.asarray(gk[:, 0, :5]), np.asarray(k[:, 0]), rtol=1e-6
    )


def test_jit_cache_ops():
    st = create_kvcache(CFG)

    @jax.jit
    def step(st, users, lens, k, v):
        st, slots = allocate_kvcache(st, CFG, users, lens)
        st = append_kvcache(st, CFG, slots, k, v, lens)
        return st, slots

    k, v = _kv(2, 4)
    st, slots = step(
        st, jnp.asarray([9, 8], jnp.int64), jnp.asarray([4, 2], jnp.int32),
        k, v,
    )
    _, cached = lookup_kvcache(st, jnp.asarray([9, 8], jnp.int64))
    np.testing.assert_array_equal(np.asarray(cached), [4, 2])
