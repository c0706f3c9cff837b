"""Host-RAM + SSD tiered storage tests (reference:
flex_kvcache_manager.py multi-tier backend)."""
import numpy as np
import pytest

from recsys_examples_tpu.dynamicemb.tiered_storage import (
    SSDStore,
    TieredHostStorage,
)

DIM = 8


def rows_for(keys):
    return np.tile(np.asarray(keys, np.float32)[:, None], (1, DIM))


def test_ssd_store_roundtrip(tmp_path):
    s = SSDStore(str(tmp_path / "arena.bin"), DIM, capacity=16)
    keys = np.arange(10, dtype=np.int64)
    assert s.put(keys, rows_for(keys), keys * 10) == 10
    r, sc, f = s.get(np.asarray([3, 99, 7], np.int64))
    assert f.tolist() == [True, False, True]
    np.testing.assert_allclose(r[0], rows_for([3])[0])
    assert sc[0] == 30 and sc[2] == 70
    s.erase(np.asarray([3], np.int64))
    _, _, f = s.get(np.asarray([3], np.int64))
    assert not f[0]
    # arena full -> put stops at capacity
    more = np.arange(100, 120, dtype=np.int64)
    stored = s.put(more, rows_for(more))
    assert len(s) == 16 and stored == 7


def test_tiered_spill_and_promote(tmp_path):
    t = TieredHostStorage(
        DIM, ram_capacity=4, ssd_path=str(tmp_path / "a.bin"),
        ssd_capacity=32,
    )
    keys = np.arange(10, dtype=np.int64)
    # ascending scores: lowest-score entries spill first
    t.put_batch(keys, rows_for(keys), scores=keys)
    assert t.ram_len <= 4
    assert t.ssd_len == len(keys) - t.ram_len
    assert t.stats["ssd_spills"] >= 6
    # low-score keys live on SSD; get() must find them and promote
    r, f = t.get_batch(np.asarray([0, 1, 9], np.int64))
    assert f.all()
    np.testing.assert_allclose(r[0], rows_for([0])[0])
    np.testing.assert_allclose(r[2], rows_for([9])[0])
    assert t.stats["ssd_hits"] >= 2
    # promotion keeps RAM within capacity
    assert t.ram_len <= 4
    # export covers both tiers
    seen = set()
    for ks, rs, ss in t.export():
        seen.update(int(k) for k in ks)
    assert seen == set(range(10))


def test_hybrid_embedding_with_tiered_host(tmp_path):
    import jax.numpy as jnp

    from recsys_examples_tpu.dynamicemb.batched_table import (
        DynamicEmbeddingTable,
    )
    from recsys_examples_tpu.dynamicemb.dynamicemb_config import (
        DynamicEmbInitializerArgs,
        DynamicEmbInitializerMode,
        DynamicEmbTableOptions,
    )
    from recsys_examples_tpu.dynamicemb.hybrid_storage import (
        HybridDynamicEmbedding,
    )
    from recsys_examples_tpu.dynamicemb.optimizer import SparseOptimizerArgs

    tbl = DynamicEmbeddingTable(
        DynamicEmbTableOptions(
            embedding_dim=DIM, max_capacity=64, bucket_capacity=8,
            initializer_args=DynamicEmbInitializerArgs(
                mode=DynamicEmbInitializerMode.DEBUG
            ),
        ),
        SparseOptimizerArgs(optimizer="sgd"),
    )
    tiered = TieredHostStorage(
        tbl.value_dim, ram_capacity=8,
        ssd_path=str(tmp_path / "emb.bin"), ssd_capacity=256,
    )
    hyb = HybridDynamicEmbedding(tbl, host_storage=tiered)
    st = hyb.init_state()
    # overfill the device table in waves so evictions flush to host and
    # spill down to SSD
    for wave in range(4):
        keys = np.arange(wave * 64, wave * 64 + 64, dtype=np.int64)
        st = hyb.prefetch(st, keys)
        st, _, _ = tbl.forward_train(st, jnp.asarray(keys))
    # early keys were evicted: prefetch must pull them back (via SSD)
    early = np.arange(0, 16, dtype=np.int64)
    st = hyb.prefetch(st, early)
    import jax

    _, found = __import__(
        "recsys_examples_tpu.dynamicemb.hashtable", fromlist=["lookup"]
    ).lookup(st.table, jnp.asarray(early))
    assert np.asarray(found).mean() > 0.5


def test_host_kv_storage_ssd_spill(tmp_path):
    import jax
    import jax.numpy as jnp

    from recsys_examples_tpu.inference.kvcache import (
        HostKVStorage,
        KVCacheConfig,
        allocate_kvcache,
        append_kvcache,
        create_kvcache,
        lookup_kvcache,
    )

    cfg = KVCacheConfig(
        num_layers=1, num_heads=1, head_dim=8, page_size=4,
        num_pages=64, max_users=16, max_pages_per_user=4,
    )
    host = HostKVStorage(cfg, ram_capacity_users=2, ssd_dir=str(tmp_path))
    state = create_kvcache(cfg)
    for uid in (1, 2, 3, 4):
        u = jnp.asarray([uid], jnp.int64)
        state, slots = allocate_kvcache(state, cfg, u,
                                        jnp.asarray([4], jnp.int32))
        k = jnp.full((1, 1, 4, 1, 8), float(uid))
        state = append_kvcache(state, cfg, slots, k, k,
                               jnp.asarray([4], jnp.int32))
        host.offload(state, uid)
    assert host.stats["ssd_spills"] == 2       # users 1, 2 spilled
    assert len(host) == 4
    # lookup of a spilled user promotes it back and its KV onboards
    assert host.lookup(1) == 4
    assert host.stats["ssd_hits"] == 1
    state2 = create_kvcache(cfg)
    state2 = host.onboard(state2, 1)
    slot, cached = lookup_kvcache(state2, jnp.asarray([1], jnp.int64))
    assert int(cached[0]) == 4
