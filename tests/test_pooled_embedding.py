"""Pooled (bag) dynamic embedding vs a dense Embed + segment-sum twin
(reference: gather_embedding_pooled, dynamic_emb_op.cu:106)."""
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
from recsys_examples_tpu.dynamicemb.optimizer import SparseOptimizerArgs
from recsys_examples_tpu.dynamicemb.pooled import (
    PooledDynamicEmbedding,
    PoolingMode,
)
from recsys_examples_tpu.dynamicemb.sharded_collection import (
    ShardedDynamicEmbedding,
)

DIM = 8
VOCAB = 64


def make_pooled(mode):
    tbl = DynamicEmbeddingTable(
        DynamicEmbTableOptions(
            embedding_dim=DIM, max_capacity=256, bucket_capacity=8,
            initializer_args=DynamicEmbInitializerArgs(
                mode=DynamicEmbInitializerMode.DEBUG
            ),
        ),
        SparseOptimizerArgs(optimizer="sgd", learning_rate=0.5),
    )
    return PooledDynamicEmbedding(
        ShardedDynamicEmbedding(tbl, mesh=None), mode=mode
    )


def bags():
    lengths = np.array([3, 0, 2, 4], np.int32)
    offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
    T = 12  # capacity > total (9): padding tail
    ids = np.zeros((T,), np.int64)
    rng = np.random.default_rng(0)
    ids[: offsets[-1]] = rng.integers(1, VOCAB, offsets[-1])
    ids[2] = ids[0]  # duplicate inside a bag
    return jnp.asarray(ids), jnp.asarray(offsets), lengths


@pytest.mark.parametrize("mode", [PoolingMode.SUM, PoolingMode.MEAN])
def test_pooled_forward_matches_dense_twin(mode):
    pe = make_pooled(mode)
    st = pe.init_state()
    ids, offsets, lengths = bags()
    st, pooled, res = pe.forward(st, ids, offsets, train=True)

    # dense twin: DEBUG initializer embeds key k as (k % 100000)/1e5
    emb = (np.asarray(ids) % 100000) / 100000.0
    rows = np.tile(emb[:, None], (1, DIM))
    want = np.zeros((4, DIM))
    offs = np.asarray(offsets)
    for b in range(4):
        seg = rows[offs[b]:offs[b + 1]]
        if len(seg):
            want[b] = seg.sum(0)
            if mode == PoolingMode.MEAN:
                want[b] /= len(seg)
    np.testing.assert_allclose(np.asarray(pooled), want, rtol=1e-5, atol=1e-6)


def test_pooled_backward_sgd_update():
    pe = make_pooled(PoolingMode.SUM)
    st = pe.init_state()
    ids, offsets, lengths = bags()
    st, pooled, res = pe.forward(st, ids, offsets, train=True)
    g = jnp.ones((4, DIM), jnp.float32)
    st = pe.backward(st, res, g)

    # expected: row(k) -= lr * count(k in its bag occurrences) * 1
    st2, pooled2, _ = pe.forward(st, ids, offsets, train=True)
    ids_np = np.asarray(ids)[: np.asarray(offsets)[-1]]
    counts = {}
    for k in ids_np:
        counts[k] = counts.get(k, 0) + 1
    base = (ids_np % 100000) / 100000.0
    # check a duplicated id accumulated both token grads
    dup = ids_np[0]
    emb_dup = np.asarray(pooled2)  # via pooled diff is messy; check rows
    tbl = pe.inner.table
    rows = tbl.forward_eval(st, jnp.asarray(sorted(set(ids_np)), jnp.int64))
    for i, k in enumerate(sorted(set(ids_np))):
        want = (k % 100000) / 100000.0 - 0.5 * counts[k]
        np.testing.assert_allclose(
            np.asarray(rows)[i, 0], want, rtol=1e-5, atol=1e-6
        )


def test_pooled_matches_autodiff_dense_embed():
    """Grad parity vs an nn.Embed + segment_sum autodiff twin."""
    import flax.linen as nn

    pe = make_pooled(PoolingMode.MEAN)
    st = pe.init_state()
    ids, offsets, lengths = bags()
    st, pooled, res = pe.forward(st, ids, offsets, train=True)

    # build a dense table holding the same rows
    table = np.zeros((VOCAB, DIM), np.float32)
    for k in range(VOCAB):
        table[k] = (k % 100000) / 100000.0
    tb = jnp.asarray(table)
    offs = np.asarray(offsets)
    seg = np.zeros((12,), np.int32)
    for b in range(4):
        seg[offs[b]:offs[b + 1]] = b
    segj = jnp.asarray(seg)
    valid = jnp.arange(12) < int(offs[-1])

    def dense_pooled(tb):
        per = tb[jnp.clip(ids, 0, VOCAB - 1)]
        per = jnp.where(valid[:, None], per, 0)
        s = jax.ops.segment_sum(per, segj, num_segments=4)
        den = jnp.maximum(jnp.asarray(lengths), 1).astype(jnp.float32)
        return s / den[:, None]

    np.testing.assert_allclose(
        np.asarray(pooled), np.asarray(dense_pooled(tb)),
        rtol=1e-5, atol=1e-6,
    )
    # backward: after one SGD step, rows must equal dense-twin SGD rows
    g = jax.random.normal(jax.random.PRNGKey(1), (4, DIM))
    st = pe.backward(st, res, g)
    gtab = jax.grad(lambda tb: (dense_pooled(tb) * g).sum())(tb)
    want = table - 0.5 * np.asarray(gtab)
    keys = sorted(set(np.asarray(ids)[: offs[-1]].tolist()))
    rows = pe.inner.table.forward_eval(st, jnp.asarray(keys, jnp.int64))
    for i, k in enumerate(keys):
        np.testing.assert_allclose(
            np.asarray(rows)[i], want[k], rtol=1e-4, atol=1e-5
        )
