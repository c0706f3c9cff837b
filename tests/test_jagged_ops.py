import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recsys_examples_tpu.ops.jagged import (
    concat_2D_jagged,
    interleave_jagged,
    jagged_dense_bmm_broadcast_add,
    jagged_reduce_sum,
    jagged_to_padded_dense,
    lengths_to_offsets,
    padded_dense_to_jagged,
    split_2D_jagged,
)


def make_jagged(rng, lengths, dim, total):
    T = int(np.sum(lengths))
    assert T <= total
    vals = np.zeros((total, dim), np.float32)
    vals[:T] = rng.standard_normal((T, dim)).astype(np.float32)
    offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
    return jnp.asarray(vals), jnp.asarray(offsets)


def test_jagged_dense_roundtrip():
    rng = np.random.default_rng(0)
    lengths = np.array([3, 0, 5, 2], np.int32)
    vals, offsets = make_jagged(rng, lengths, 4, total=16)
    dense = jagged_to_padded_dense(vals, offsets, max_len=6)
    assert dense.shape == (4, 6, 4)
    # rows beyond length are zero
    np.testing.assert_array_equal(np.asarray(dense[0, 3:]), 0)
    np.testing.assert_allclose(np.asarray(dense[2, :5]), np.asarray(vals[3:8]))
    back = padded_dense_to_jagged(dense, offsets, total_len=16)
    np.testing.assert_allclose(np.asarray(back), np.asarray(vals))


def test_concat_split_roundtrip():
    rng = np.random.default_rng(1)
    la = np.array([2, 4, 0], np.int32)
    lb = np.array([3, 1, 2], np.int32)
    va, oa = make_jagged(rng, la, 3, total=8)
    vb, ob = make_jagged(rng, lb, 3, total=8)
    vc, oc = concat_2D_jagged(va, oa, vb, ob)
    assert vc.shape == (16, 3)
    np.testing.assert_array_equal(np.asarray(oc), [0, 5, 10, 12])
    # sample 0: a rows 0..1 then b rows 0..2
    np.testing.assert_allclose(np.asarray(vc[0:2]), np.asarray(va[0:2]))
    np.testing.assert_allclose(np.asarray(vc[2:5]), np.asarray(vb[0:3]))
    # split back
    sa, soa, sb, sob = split_2D_jagged(
        vc, oc, jnp.asarray(la), total_a=8, total_b=8
    )
    np.testing.assert_allclose(np.asarray(sa), np.asarray(va))
    np.testing.assert_allclose(np.asarray(sb), np.asarray(vb))
    np.testing.assert_array_equal(np.asarray(soa), np.asarray(oa))
    np.testing.assert_array_equal(np.asarray(sob), np.asarray(ob))


def test_interleave():
    a = jnp.arange(6, dtype=jnp.float32).reshape(3, 2)
    b = -jnp.arange(6, dtype=jnp.float32).reshape(3, 2)
    out = interleave_jagged(a, b)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(a[0]))
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(b[0]))
    np.testing.assert_allclose(np.asarray(out[4]), np.asarray(a[2]))


def test_jagged_dense_bmm():
    rng = np.random.default_rng(2)
    lengths = np.array([2, 3], np.int32)
    vals, offsets = make_jagged(rng, lengths, 4, total=8)
    dense = jnp.asarray(rng.standard_normal((2, 4, 5)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((2, 5)).astype(np.float32))
    out = jagged_dense_bmm_broadcast_add(vals, offsets, dense, bias)
    expect = np.zeros((8, 5), np.float32)
    expect[0:2] = np.asarray(vals[0:2]) @ np.asarray(dense[0]) + np.asarray(bias[0])
    expect[2:5] = np.asarray(vals[2:5]) @ np.asarray(dense[1]) + np.asarray(bias[1])
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5)


def test_jagged_reduce_sum():
    rng = np.random.default_rng(3)
    lengths = np.array([2, 0, 3], np.int32)
    vals, offsets = make_jagged(rng, lengths, 4, total=8)
    out = jagged_reduce_sum(vals, offsets, num_segments=3)
    expect = np.stack(
        [
            np.asarray(vals[0:2]).sum(0),
            np.zeros(4, np.float32),
            np.asarray(vals[2:5]).sum(0),
        ]
    )
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5)


def test_ops_jittable():
    rng = np.random.default_rng(4)
    lengths = np.array([2, 3], np.int32)
    vals, offsets = make_jagged(rng, lengths, 4, total=8)

    @jax.jit
    def f(v, o):
        d = jagged_to_padded_dense(v, o, 4)
        return padded_dense_to_jagged(d, o, 8)

    np.testing.assert_allclose(np.asarray(f(vals, offsets)), np.asarray(vals))
