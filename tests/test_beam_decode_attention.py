"""Beam-decode attention: Pallas kernel (interpret) vs jnp reference vs a
dense softmax oracle (reference test model: corelib/gr_decode_atten/tests/
test_fwd.py against tests/reference.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recsys_examples_tpu.ops.pallas.beam_decode_attention import (
    beam_decode_attn,
    beam_decode_attn_ref,
)


def _rand_case(key, B, W, H, Hkv, D, S, N):
    ks = jax.random.split(key, 8)
    q = jax.random.normal(ks[0], (B, W, H, D), jnp.float32)
    k_ctx = jax.random.normal(ks[1], (B, S, Hkv, D), jnp.float32)
    v_ctx = jax.random.normal(ks[2], (B, S, Hkv, D), jnp.float32)
    ctx_lens = jax.random.randint(ks[3], (B,), 1, S + 1, jnp.int32)
    if N:
        k_beam = jax.random.normal(ks[4], (B, N, W, Hkv, D), jnp.float32)
        v_beam = jax.random.normal(ks[5], (B, N, W, Hkv, D), jnp.float32)
        ancestry = jax.random.randint(ks[6], (B, N, W), 0, W, jnp.int32)
    else:
        k_beam = v_beam = ancestry = None
    return q, k_ctx, v_ctx, ctx_lens, k_beam, v_beam, ancestry


def _dense_oracle(q, k_ctx, v_ctx, ctx_lens, k_beam, v_beam, anc, scale):
    """Brute-force per (b, w, h) softmax over the gathered key list."""
    B, W, H, D = q.shape
    S = k_ctx.shape[1]
    Hkv = k_ctx.shape[2]
    G = H // Hkv
    N = 0 if k_beam is None else k_beam.shape[1]
    out = np.zeros((B, W, H, D), np.float32)
    qn, kn, vn = map(np.asarray, (q, k_ctx, v_ctx))
    ln = np.asarray(ctx_lens)
    for b in range(B):
        for w in range(W):
            for h in range(H):
                hk = h // G
                keys = [kn[b, s, hk] for s in range(ln[b])]
                vals = [vn[b, s, hk] for s in range(ln[b])]
                if N:
                    for n in range(N):
                        p = int(np.asarray(anc)[b, n, w])
                        keys.append(np.asarray(k_beam)[b, n, p, hk])
                        vals.append(np.asarray(v_beam)[b, n, p, hk])
                sc = np.array([qn[b, w, h] @ kk for kk in keys]) * scale
                sc -= sc.max()
                p = np.exp(sc)
                p /= p.sum()
                out[b, w, h] = (p[:, None] * np.array(vals)).sum(0)
    return out


@pytest.mark.parametrize("N", [0, 3])
def test_ref_matches_dense_oracle(N):
    case = _rand_case(jax.random.PRNGKey(0), B=2, W=4, H=2, Hkv=2, D=8,
                      S=10, N=N)
    scale = 0.3
    got = beam_decode_attn_ref(*case, sm_scale=scale)
    want = _dense_oracle(*case, scale)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_ref_gqa():
    case = _rand_case(jax.random.PRNGKey(1), B=2, W=4, H=4, Hkv=2, D=8,
                      S=7, N=2)
    got = beam_decode_attn_ref(*case, sm_scale=0.5)
    want = _dense_oracle(*case, 0.5)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("N,Hkv", [(0, 4), (2, 4), (3, 2)])
def test_pallas_matches_ref(N, Hkv):
    case = _rand_case(jax.random.PRNGKey(2), B=2, W=8, H=4, Hkv=Hkv,
                      D=128, S=384, N=N)
    scale = 1.0 / 128 ** 0.5
    want = beam_decode_attn_ref(*case, sm_scale=scale)
    got = beam_decode_attn(
        *case, sm_scale=scale, backend="pallas", interpret=True,
        block_ctx=128,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )
