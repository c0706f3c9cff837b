"""Dynamic embedding engine tests: unique, hash table, table module,
optimizers (reference test model: corelib/dynamicemb/test/)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recsys_examples_tpu.dynamicemb.batched_table import DynamicEmbeddingTable
from recsys_examples_tpu.dynamicemb.dynamicemb_config import (
    EMPTY_KEY,
    DynamicEmbInitializerArgs,
    DynamicEmbInitializerMode,
    DynamicEmbScoreStrategy,
    DynamicEmbTableOptions,
)
from recsys_examples_tpu.dynamicemb.hashtable import (
    create_table_state,
    insert_and_evict,
    lookup,
    table_size,
)
from recsys_examples_tpu.dynamicemb.optimizer import SparseOptimizerArgs
from recsys_examples_tpu.dynamicemb.unique_op import (
    segmented_unique,
    table_offsets_from_unique,
)


def test_segmented_unique_basic():
    keys = jnp.array([5, 3, 5, 7, 3, 5], jnp.int64)
    uk, rev, utid, nu = segmented_unique(keys)
    assert int(nu) == 3
    uk_np = np.asarray(uk[:3])
    np.testing.assert_array_equal(uk_np, [3, 5, 7])
    # reverse maps each input to its unique slot
    np.testing.assert_array_equal(np.asarray(uk)[np.asarray(rev)], np.asarray(keys))


def test_segmented_unique_multi_table_and_padding():
    keys = jnp.array([5, 3, 5, EMPTY_KEY, 3, 9], jnp.int64)
    tids = jnp.array([0, 0, 1, 0, 0, 1], jnp.int32)
    uk, rev, utid, nu, counts = segmented_unique(
        keys, tids, num_tables=2, return_counts=True
    )
    # uniques: (0,3) (0,5) (1,5) (1,9)
    assert int(nu) == 4
    np.testing.assert_array_equal(np.asarray(uk[:4]), [3, 5, 5, 9])
    np.testing.assert_array_equal(np.asarray(utid[:4]), [0, 0, 1, 1])
    np.testing.assert_array_equal(np.asarray(counts[:4]), [2, 1, 1, 1])
    offs = table_offsets_from_unique(utid, nu, 2)
    np.testing.assert_array_equal(np.asarray(offs), [0, 2, 4])


def test_hashtable_insert_lookup_evict():
    st = create_table_state(capacity=16, bucket_capacity=8, value_dim=4)
    keys = jnp.arange(1, 7, dtype=jnp.int64)
    vals = jnp.tile(keys[:, None].astype(jnp.float32), (1, 4))
    scores = jnp.arange(10, 16, dtype=jnp.int64)
    st, slots, ev = insert_and_evict(st, keys, scores, vals)
    assert int((np.asarray(slots) >= 0).sum()) == 6
    assert int(table_size(st)) == 6
    s2, found = lookup(st, keys)
    np.testing.assert_array_equal(np.asarray(found), True)
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(slots))
    got = np.asarray(st.values[np.asarray(s2)])
    np.testing.assert_allclose(got, np.asarray(vals))

    # fill one bucket completely and force eviction of the min-score key
    st2 = create_table_state(capacity=8, bucket_capacity=8, value_dim=1)
    keys8 = jnp.arange(1, 9, dtype=jnp.int64)
    sc8 = jnp.arange(100, 108, dtype=jnp.int64)
    st2, sl8, _ = insert_and_evict(st2, keys8, sc8, jnp.zeros((8, 1)))
    assert int(table_size(st2)) == 8
    newk = jnp.array([99], jnp.int64)
    st2, sln, evn = insert_and_evict(
        st2, newk, jnp.array([200], jnp.int64), jnp.ones((1, 1))
    )
    assert int(sln[0]) >= 0 and bool(evn[0])
    _, f1 = lookup(st2, jnp.array([1], jnp.int64))  # min score key evicted
    assert not bool(f1[0])
    _, f99 = lookup(st2, newk)
    assert bool(f99[0])


def test_hashtable_same_bucket_conflicts():
    # all keys in ONE bucket (capacity 1 bucket) inserted simultaneously
    st = create_table_state(capacity=8, bucket_capacity=8, value_dim=1)
    keys = jnp.arange(1, 7, dtype=jnp.int64)
    st, slots, _ = insert_and_evict(
        st, keys, jnp.ones((6,), jnp.int64), jnp.zeros((6, 1)), rounds=8
    )
    s = np.asarray(slots)
    assert (s >= 0).all()
    assert len(set(s.tolist())) == 6  # all distinct slots
    _, found = lookup(st, keys)
    assert np.asarray(found).all()


def _mk_table(admission=0, strategy=DynamicEmbScoreStrategy.TIMESTAMP,
              optimizer="adam"):
    opts = DynamicEmbTableOptions(
        embedding_dim=8,
        max_capacity=64,
        bucket_capacity=8,
        score_strategy=strategy,
        admission_threshold=admission,
        initializer_args=DynamicEmbInitializerArgs(
            mode=DynamicEmbInitializerMode.DEBUG
        ),
    )
    return DynamicEmbeddingTable(
        opts, SparseOptimizerArgs(optimizer=optimizer, learning_rate=0.1)
    )


def test_table_train_eval_and_update():
    tbl = _mk_table()
    state = tbl.init_state()
    keys = jnp.array([11, 22, 33, EMPTY_KEY], jnp.int64)
    state, slots, emb = tbl.forward_train(state, keys)
    assert (np.asarray(slots[:3]) >= 0).all()
    # debug init: rows = key%1e5/1e5
    np.testing.assert_allclose(
        np.asarray(emb[0]), np.full(8, 11 / 100000.0), rtol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(emb[3]), 0)

    # eval finds stored keys, zero for missing
    ev = tbl.forward_eval(state, jnp.array([11, 999], jnp.int64))
    np.testing.assert_allclose(np.asarray(ev[0]), np.asarray(emb[0]), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(ev[1]), 0)

    # sparse adam update moves the stored row
    grads = jnp.ones((4, 8), jnp.float32)
    state = tbl.backward(state, slots, grads)
    ev2 = tbl.forward_eval(state, jnp.array([11], jnp.int64))
    assert float(ev2[0, 0]) < float(emb[0, 0])


def test_table_admission():
    tbl = _mk_table(admission=2)
    state = tbl.init_state()
    keys = jnp.array([7], jnp.int64)
    # first sight: count=1 < 2 -> not admitted (transient init, not stored)
    state, slots, emb = tbl.forward_train(state, keys)
    assert int(slots[0]) == -1
    ev = tbl.forward_eval(state, keys)
    np.testing.assert_array_equal(np.asarray(ev), 0)
    # second sight: count=2 >= 2 -> admitted
    state, slots, emb = tbl.forward_train(state, keys)
    assert int(slots[0]) >= 0
    ev = tbl.forward_eval(state, keys)
    np.testing.assert_allclose(np.asarray(ev[0]), np.asarray(emb[0]), rtol=1e-6)


def test_table_lfu_scores():
    tbl = _mk_table(strategy=DynamicEmbScoreStrategy.LFU)
    state = tbl.init_state()
    keys = jnp.array([5, 5, 9], jnp.int64)
    uk, rev, _, nu, counts = segmented_unique(keys, return_counts=True)
    state, slots, emb = tbl.forward_train(state, uk, frequencies=counts)
    s = np.asarray(slots)
    sc = np.asarray(state.table.scores.reshape(-1))
    k = np.asarray(uk)
    # key 5 (count 2) has higher score than key 9 (count 1)
    i5 = int(np.where(k == 5)[0][0])
    i9 = int(np.where(k == 9)[0][0])
    assert sc[s[i5]] == 2 and sc[s[i9]] == 1


def test_table_jit_roundtrip():
    tbl = _mk_table(optimizer="rowwise_adagrad")
    state = tbl.init_state()

    @jax.jit
    def step(state, keys):
        state, slots, emb = tbl.forward_train(state, keys)
        state = tbl.backward(state, slots, jnp.ones_like(emb))
        return state, emb

    for i in range(3):
        state, emb = step(state, jnp.array([i, i + 1, 100], jnp.int64))
    assert int(table_size(state.table)) == 5  # {0,1,2,3,100}


def test_get_set_score_and_fill():
    tbl = DynamicEmbeddingTable(
        DynamicEmbTableOptions(embedding_dim=4, max_capacity=64,
                               bucket_capacity=8),
        SparseOptimizerArgs(optimizer="sgd"),
    )
    st = tbl.init_state()
    keys = jnp.arange(1, 9, dtype=jnp.int64)
    vals = jnp.tile(keys[:, None].astype(jnp.float32), (1, 4))
    st = tbl.fill(st, keys, vals, scores=keys * 100)
    sc = tbl.get_score(st, keys)
    np.testing.assert_array_equal(np.asarray(sc), np.asarray(keys) * 100)
    missing = tbl.get_score(st, jnp.asarray([999], jnp.int64))
    assert int(missing[0]) == -1
    st = tbl.set_score(st, keys[:2], jnp.asarray([7, 8], jnp.int64))
    sc2 = tbl.get_score(st, keys[:2])
    np.testing.assert_array_equal(np.asarray(sc2), [7, 8])


def test_fill_with_duplicate_keys_last_wins():
    # insert_and_evict's hit-refresh scatter needs deduped keys; the
    # public fill() path must dedup (last occurrence wins, dict
    # semantics) rather than rely on callers.
    tbl = DynamicEmbeddingTable(
        DynamicEmbTableOptions(embedding_dim=4, max_capacity=64,
                               bucket_capacity=8),
        SparseOptimizerArgs(optimizer="sgd"),
    )
    st = tbl.init_state()
    keys = jnp.asarray([5, 7, 5, 9, 7, 7], jnp.int64)
    vals = jnp.tile(
        jnp.arange(6, dtype=jnp.float32)[:, None], (1, 4)
    )
    st = tbl.fill(st, keys, vals, scores=jnp.arange(10, 16, dtype=jnp.int64))
    emb = tbl.forward_eval(st, jnp.asarray([5, 7, 9], jnp.int64))
    np.testing.assert_allclose(np.asarray(emb[:, 0]), [2.0, 5.0, 3.0])
    sc = tbl.get_score(st, jnp.asarray([5, 7, 9], jnp.int64))
    np.testing.assert_array_equal(np.asarray(sc), [12, 15, 13])


def test_watchdog_fires_without_real_stderr():
    import io
    import sys as _sys

    from recsys_examples_tpu.utils.watchdog import StackDumpWatchdog

    wd = StackDumpWatchdog(timeout_s=1000.0, repeat=False)
    old = _sys.stderr
    _sys.stderr = io.StringIO()
    try:
        wd._fire()  # must not raise even with fileno-less stderr
        out = _sys.stderr.getvalue()
    finally:
        _sys.stderr = old
        wd.cancel()
    assert "watchdog" in out
    assert "Thread" in out


def test_expand_preserves_entries():
    tbl = DynamicEmbeddingTable(
        DynamicEmbTableOptions(embedding_dim=4, max_capacity=64,
                               bucket_capacity=8),
        SparseOptimizerArgs(optimizer="rowwise_adagrad"),
    )
    st = tbl.init_state()
    keys = jnp.arange(1, 33, dtype=jnp.int64)
    vals = jnp.tile(keys[:, None].astype(jnp.float32), (1, 4))
    st = tbl.fill(st, keys, vals, scores=keys)
    tbl2, st2 = tbl.expand(st, factor=2)
    assert tbl2.capacity == 128
    from recsys_examples_tpu.dynamicemb.hashtable import lookup, table_size

    assert int(table_size(st2.table)) == 32
    slots, found = lookup(st2.table, keys)
    assert bool(found.all())
    emb = st2.table.values[np.asarray(slots)]
    np.testing.assert_allclose(np.asarray(emb), np.asarray(vals))
    sc = tbl2.get_score(st2, keys)
    np.testing.assert_array_equal(np.asarray(sc), np.asarray(keys))
