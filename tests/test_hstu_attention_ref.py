"""Validate the jnp HSTU reference attention against a per-sample numpy
brute-force implementation (independent loop-based mask construction)."""
import jax.numpy as jnp
import numpy as np
import pytest

from recsys_examples_tpu.ops.hstu_attention_ref import (
    get_valid_attn_mask,
    hstu_mha_reference,
)


def silu(x):
    return x / (1.0 + np.exp(-x))


def brute_force_mask(n, N, causal, c, t, g, max_attn_len, min_full=0):
    """Mask for one sample, built token-by-token from the semantics:
    - token j has position id max(j - c + 1, 0); contextual tokens share id 0
    - causal: attend iff my id > their id, or same absolute position
    - targets: last t tokens, group size g: no inter-group attention
    - local window on id distance
    - contextual rows attend to all non-target valid tokens
    """
    mask = np.zeros((N, N), bool)
    ids = np.array([max(j - c + 1, 0) for j in range(N)])
    max_id = n - c + 1
    for i in range(N):
        for j in range(N):
            d = ids[i] - ids[j] if causal else abs(ids[i] - ids[j])
            ok = (i == j) or d > 0
            if t > 0:
                tgi = max(ids[i] - max_id + t, -1) // g
                tgj = max(ids[j] - max_id + t, -1) // g
                if not (tgi == tgj or tgi < 0 or tgj < 0):
                    ok = False
            hist_max_id = max_id - t
            if max_attn_len > 0:
                if min_full > 0:
                    if not (d <= max_attn_len or ids[i] >= hist_max_id - min_full):
                        ok = False
                elif d > max_attn_len:
                    ok = False
            if c > 0 and ids[i] == 0 and ids[j] < hist_max_id:
                ok = True
            mask[i, j] = ok
    return mask


CASES = [
    # (causal, ctx, tgt, group, max_attn_len)
    (True, 0, 0, 1, 0),
    (False, 0, 0, 1, 0),
    (True, 2, 0, 1, 0),
    (True, 0, 3, 1, 0),
    (True, 0, 4, 2, 0),
    (True, 2, 3, 1, 0),
    (True, 0, 0, 1, 3),
    (True, 2, 4, 2, 3),
]


@pytest.mark.parametrize("causal,c,t,g,mal", CASES)
def test_mask_matches_brute_force(causal, c, t, g, mal):
    N = 12
    lengths = np.array([12, 9, 7], np.int32)
    m = get_valid_attn_mask(
        causal=causal,
        N=N,
        seq_lengths=jnp.asarray(lengths),
        num_targets=jnp.full((3,), t, jnp.int32) if t else None,
        max_attn_len=mal,
        num_contextuals=jnp.full((3,), c, jnp.int32) if c else None,
        target_group_size=g,
    )
    for b, n in enumerate(lengths):
        expect = brute_force_mask(int(n), N, causal, c, t, g, mal)
        got = np.asarray(m[b])
        # only compare rows/cols within the valid sequence; padding region
        # is cut by the jagged conversion.
        np.testing.assert_array_equal(got[:n, :n], expect[:n, :n])


def test_hstu_mha_against_loops():
    rng = np.random.default_rng(0)
    H, D, V, N = 2, 8, 8, 10
    lengths = np.array([10, 6, 3], np.int32)
    T = 24
    offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
    q = rng.standard_normal((T, H, D)).astype(np.float32)
    k = rng.standard_normal((T, H, D)).astype(np.float32)
    v = rng.standard_normal((T, H, V)).astype(np.float32)
    q[offsets[-1]:] = 0
    k[offsets[-1]:] = 0
    v[offsets[-1]:] = 0
    alpha, scaling = 0.3, 16

    out = hstu_mha_reference(
        N, alpha, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(offsets), causal=True, scaling_seqlen=scaling,
    )
    # numpy loop per sample
    expect = np.zeros((T, H, V), np.float32)
    for b in range(3):
        n = lengths[b]
        s = offsets[b]
        mask = brute_force_mask(int(n), int(n), True, 0, 0, 1, 0)
        for h in range(H):
            qk = q[s:s + n, h] @ k[s:s + n, h].T * alpha
            p = silu(qk) / scaling * mask
            expect[s:s + n, h] = p @ v[s:s + n, h]
    np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-4, atol=2e-5)


def test_hstu_mha_context_target():
    rng = np.random.default_rng(1)
    H, D, N = 1, 4, 9
    lengths = np.array([9, 7], np.int32)
    c, t, g = 2, 2, 1
    T = 16
    offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
    q = rng.standard_normal((T, H, D)).astype(np.float32)
    k = rng.standard_normal((T, H, D)).astype(np.float32)
    v = rng.standard_normal((T, H, D)).astype(np.float32)
    q[offsets[-1]:] = 0
    k[offsets[-1]:] = 0
    v[offsets[-1]:] = 0
    out = hstu_mha_reference(
        N, 1.0, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(offsets), causal=True,
        num_targets=jnp.full((2,), t, jnp.int32),
        num_contextuals=jnp.full((2,), c, jnp.int32),
        target_group_size=g, scaling_seqlen=N,
    )
    expect = np.zeros((T, H, D), np.float32)
    for b in range(2):
        n = int(lengths[b])
        s = offsets[b]
        mask = brute_force_mask(n, n, True, c, t, g, 0)
        qk = q[s:s + n, 0] @ k[s:s + n, 0].T
        p = silu(qk) / N * mask
        expect[s:s + n, 0] = p @ v[s:s + n, 0]
    np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-4, atol=2e-5)
