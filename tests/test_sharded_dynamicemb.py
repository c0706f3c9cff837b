"""Row-sharded dynamic embedding over an 8-device CPU mesh: the all-to-all
id/embedding exchange must be equivalent to a single-device table."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recsys_examples_tpu.dynamicemb.batched_table import DynamicEmbeddingTable
from recsys_examples_tpu.dynamicemb.dynamicemb_config import (
    EMPTY_KEY,
    DynamicEmbInitializerArgs,
    DynamicEmbInitializerMode,
    DynamicEmbTableOptions,
)
from recsys_examples_tpu.dynamicemb.optimizer import SparseOptimizerArgs
from recsys_examples_tpu.dynamicemb.sharded_collection import (
    ShardedDynamicEmbedding,
)
from recsys_examples_tpu.parallel.mesh import make_mesh


def _table(world=1):
    opts = DynamicEmbTableOptions(
        embedding_dim=8,
        max_capacity=1024,
        bucket_capacity=8,
        initializer_args=DynamicEmbInitializerArgs(
            mode=DynamicEmbInitializerMode.DEBUG
        ),
    )
    return DynamicEmbeddingTable(
        opts, SparseOptimizerArgs(optimizer="sgd", learning_rate=0.5),
        world_size=world,
    )


def test_sharded_matches_single_device():
    mesh = make_mesh(dp=8, tp=1)
    world = 8
    sharded = ShardedDynamicEmbedding(_table(world), mesh)
    single = ShardedDynamicEmbedding(_table(1), mesh=None)

    st_sh = sharded.init_state()
    st_si = single.init_state()

    rng = np.random.default_rng(0)
    ids_np = rng.integers(0, 500, size=(128,)).astype(np.int64)
    ids = jnp.asarray(ids_np)

    st_sh, emb_sh, res_sh = sharded.forward(st_sh, ids)
    st_si, emb_si, res_si = single.forward(st_si, ids)
    # debug initializer: value depends only on the key -> shard placement
    # must not change results
    np.testing.assert_allclose(
        np.asarray(emb_sh), np.asarray(emb_si), rtol=1e-6
    )
    expect = np.tile((ids_np % 100000) / 100000.0, (8, 1)).T
    np.testing.assert_allclose(np.asarray(emb_sh), expect, rtol=1e-5)

    # backward: sgd update, then eval lookup must match single-device
    g = jnp.asarray(rng.standard_normal((128, 8)).astype(np.float32))
    st_sh = sharded.backward(st_sh, res_sh, g)
    st_si = single.backward(st_si, res_si, g)

    st_sh2, emb_sh2, _ = sharded.forward(st_sh, ids, train=False)
    st_si2, emb_si2, _ = single.forward(st_si, ids, train=False)
    np.testing.assert_allclose(
        np.asarray(emb_sh2), np.asarray(emb_si2), rtol=1e-5, atol=1e-6
    )
    # grads for duplicated ids must be summed: emb changed from init
    assert not np.allclose(np.asarray(emb_sh2), expect)


def test_sharded_jit_train_step():
    mesh = make_mesh(dp=8, tp=1)
    sharded = ShardedDynamicEmbedding(_table(8), mesh)
    state = sharded.init_state()

    @jax.jit
    def step(state, ids):
        state, emb, res = sharded.forward(state, ids)
        loss_grad = jnp.ones_like(emb)
        state = sharded.backward(state, res, loss_grad)
        return state, emb.sum()

    ids = jnp.arange(64, dtype=jnp.int64)
    for _ in range(2):
        state, s = step(state, ids)
    assert np.isfinite(float(s))


def test_grouped_features_single_pass():
    """Grouped multi-feature lookup: per-feature key spaces are isolated
    and gradients route back per feature (reference: table grouping of
    BatchedDynamicEmbeddingTablesV2)."""
    from recsys_examples_tpu.dynamicemb.sharded_collection import (
        GroupedShardedDynamicEmbedding,
    )

    table = DynamicEmbeddingTable(
        DynamicEmbTableOptions(embedding_dim=8, max_capacity=512,
                               bucket_capacity=16),
        SparseOptimizerArgs(optimizer="sgd", learning_rate=1.0),
    )
    grp = GroupedShardedDynamicEmbedding(
        table, ("item", "user"), mesh=None
    )
    st = grp.init_state()
    ids = {
        "item": jnp.asarray([5, 6, 5, 7], jnp.int64),
        "user": jnp.asarray([5, 9], jnp.int64),  # same raw id 5, other space
    }
    st, emb, res = grp.forward(st, ids)
    assert emb["item"].shape == (4, 8) and emb["user"].shape == (2, 8)
    # same raw key in different features -> independent rows
    assert not np.allclose(np.asarray(emb["item"][0]),
                           np.asarray(emb["user"][0]))
    # dup ids within a feature share a row
    np.testing.assert_allclose(np.asarray(emb["item"][0]),
                               np.asarray(emb["item"][2]))
    grads = {
        "item": jnp.ones((4, 8), jnp.float32),
        "user": jnp.zeros((2, 8), jnp.float32),
    }
    st2 = grp.backward(st, res, grads)
    st3, emb2, _ = grp.forward(st2, ids)
    # item rows moved by sgd, user rows unchanged
    assert not np.allclose(np.asarray(emb2["item"]), np.asarray(emb["item"]))
    np.testing.assert_allclose(np.asarray(emb2["user"]),
                               np.asarray(emb["user"]), atol=1e-6)


def test_grouped_features_on_mesh():
    """Grouped multi-feature pass over the 8-device mesh (one fused id
    all-to-all for all features)."""
    from recsys_examples_tpu.dynamicemb.sharded_collection import (
        GroupedShardedDynamicEmbedding,
    )
    from recsys_examples_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=8, tp=1)
    table = DynamicEmbeddingTable(
        DynamicEmbTableOptions(embedding_dim=8, max_capacity=1024,
                               bucket_capacity=16),
        SparseOptimizerArgs(optimizer="sgd", learning_rate=1.0),
        world_size=8,
    )
    grp = GroupedShardedDynamicEmbedding(table, ("item", "user"), mesh=mesh)
    st = grp.init_state()
    rng = np.random.default_rng(0)
    ids = {
        "item": jnp.asarray(rng.integers(1, 500, size=(64,)), jnp.int64),
        "user": jnp.asarray(rng.integers(1, 500, size=(32,)), jnp.int64),
    }
    st, emb, res = grp.forward(st, ids)
    assert emb["item"].shape == (64, 8) and emb["user"].shape == (32, 8)
    # determinism: same ids -> same embeddings on a second lookup
    st2, emb2, _ = grp.forward(st, ids)
    np.testing.assert_allclose(np.asarray(emb2["item"]),
                               np.asarray(emb["item"]), atol=1e-6)
    grads = {
        "item": jnp.ones((64, 8), jnp.float32),
        "user": jnp.zeros((32, 8), jnp.float32),
    }
    st3 = grp.backward(st, res, grads)
    st4, emb3, _ = grp.forward(st3, ids)
    assert not np.allclose(np.asarray(emb3["item"]), np.asarray(emb["item"]))


def test_route_owner_np_matches_jax():
    """Host-side routing (hybrid-storage prefetch bucketing) must stay in
    bit-lockstep with the in-jit routing."""
    from recsys_examples_tpu.dynamicemb.sharded_collection import (
        route_owner,
        route_owner_np,
    )

    rng = np.random.default_rng(3)
    keys = rng.integers(0, 2 ** 58, size=(4096,)).astype(np.int64)
    for W in (2, 3, 8):
        np.testing.assert_array_equal(
            np.asarray(route_owner(jnp.asarray(keys), W)),
            route_owner_np(keys, W),
        )


def test_routing_balances_structured_ids():
    """mix64 routing must spread structured id layouts (all-even ids,
    dense ranges, grouped-feature tid<<58 tags) near-binomially, which is
    the property that makes a static a2a bucket cap safe."""
    from recsys_examples_tpu.dynamicemb.sharded_collection import (
        route_owner_np,
    )

    W = 8
    layouts = {
        "all_even": np.arange(0, 8192, 2, dtype=np.int64),
        "dense": np.arange(4096, dtype=np.int64),
        "tagged": np.arange(4096, dtype=np.int64) + (np.int64(3) << 58),
    }
    for name, ids in layouts.items():
        counts = np.bincount(route_owner_np(ids, W), minlength=W)
        mean = len(ids) / W
        assert counts.max() < 1.35 * mean, (name, counts)


def _all_owned_by(rank, count, W, seed=0):
    """Craft `count` distinct keys that all route to `rank` under mix64
    (adversarial skew the binomial model can't produce by chance)."""
    from recsys_examples_tpu.dynamicemb.sharded_collection import (
        route_owner_np,
    )

    rng = np.random.default_rng(seed)
    out = []
    while len(out) < count:
        cand = rng.integers(1, 2 ** 40, size=(4096,)).astype(np.int64)
        sel = cand[route_owner_np(cand, W) == rank]
        out.extend(int(k) for k in sel)
    return np.unique(np.array(out[:count], np.int64))[:count]


def test_overflow_counted_then_adaptive_growth_trains():
    """A2A bucket overflow must never be silent (VERDICT r3 #2): the
    residual reports the count, and growing bucket_factor (AdaptiveBucketing
    policy) + re-tracing eliminates it so the overflowed rows train."""
    from recsys_examples_tpu.dynamicemb.sharded_collection import (
        AdaptiveBucketing,
    )

    mesh = make_mesh(dp=8, tp=1)
    W = 8
    # 64 distinct keys, ALL owned by rank 3 -> with ids split 8/rank each
    # rank sends 8 keys to one bucket; bucket cap for n=8 local ids at
    # factor 1.0 is max(8, ...) = 8 ... use more keys to force overflow.
    hot = _all_owned_by(3, 256, W)
    ids_np = hot  # 256 ids -> 32 per rank, all to owner 3
    sharded = ShardedDynamicEmbedding(
        _table(W), mesh, bucket_factor=1.0
    )
    st = sharded.init_state()
    ids = jnp.asarray(ids_np)
    st, emb, res = sharded.forward(st, ids)
    novf = int(np.sum(np.asarray(res.num_overflow)))
    # cap = 1.0 * 32/8 = 4 rounded to 8; each rank has 32 keys for owner 3
    # -> 24 overflow per rank
    assert novf > 0
    # forward still finite (transient-init fallback, not garbage)
    assert np.isfinite(np.asarray(emb)).all()

    # trainer-style policy: sustained overflow grows the factor. All keys
    # to ONE owner is the worst case: cap clears only at factor >= W.
    pol = AdaptiveBucketing([sharded], patience=2, growth=8.0,
                            max_factor=16.0)
    assert pol.observe(novf) is False          # first hit: patience
    assert pol.observe(novf) is True           # second: grow + re-jit
    assert sharded.bucket_factor == 8.0

    # re-trace at the larger cap: overflow gone, rows actually train
    st, emb, res = sharded.forward(st, ids)
    assert int(np.sum(np.asarray(res.num_overflow))) == 0
    g = jnp.ones((ids.shape[0], 8), jnp.float32)
    st = sharded.backward(st, res, g)
    st, emb2, _ = sharded.forward(st, ids, train=False)
    before = np.tile((ids_np % 100000) / 100000.0, (8, 1)).T
    moved = np.abs(np.asarray(emb2) - before).max(axis=1)
    assert (moved > 1e-3).all(), "every hot-owner row must receive grads"


def test_hot_single_key_no_overflow():
    """90% of ids = one hot key per shard: per-rank dedup collapses the
    hot key to one unique, so no overflow and the hot row still trains."""
    mesh = make_mesh(dp=8, tp=1)
    sharded = ShardedDynamicEmbedding(_table(8), mesh, bucket_factor=2.0)
    st = sharded.init_state()
    rng = np.random.default_rng(1)
    ids_np = np.where(
        rng.random(256) < 0.9, 7, rng.integers(100, 500, size=(256,))
    ).astype(np.int64)
    ids = jnp.asarray(ids_np)
    st, emb, res = sharded.forward(st, ids)
    assert int(np.sum(np.asarray(res.num_overflow))) == 0
    st = sharded.backward(st, res, jnp.ones((256, 8), jnp.float32))
    st, emb2, _ = sharded.forward(st, ids, train=False)
    hot = np.asarray(emb2)[ids_np == 7]
    # duplicated grads summed into the hot row -> it moved a lot
    assert np.abs(hot - 7 / 100000.0).max() > 0.5
