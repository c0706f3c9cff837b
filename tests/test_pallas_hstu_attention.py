"""Pallas HSTU attention vs jnp reference (interpret mode on CPU).

The same kernels run compiled on real TPU (driven by bench.py and the
verify recipe); interpret mode checks kernel logic hermetically in CI.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recsys_examples_tpu.ops.hstu_attention_ref import hstu_mha_reference
from recsys_examples_tpu.ops.pallas.hstu_attention import hstu_attn_varlen

H, D, N = 2, 128, 256
LENGTHS = np.array([200, 37, 128], np.int32)
T = 512
OFFSETS = np.concatenate([[0], np.cumsum(LENGTHS)]).astype(np.int32)


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.default_rng(0)

    def mk():
        x = rng.standard_normal((T, H, D)).astype(np.float32) * 0.3
        x[OFFSETS[-1]:] = 0
        return jnp.asarray(x)

    return mk(), mk(), mk(), jnp.asarray(OFFSETS)


CASES = {
    "causal": (None, None, {}),
    "ctx_tgt_group": (
        np.array([3, 2, 0], np.int32),
        np.array([10, 4, 6], np.int32),
        dict(target_group_size=2),
    ),
    "noncausal": (None, None, dict(causal=False)),
    "local_window": (None, None, dict(max_attn_len=64)),
}


@pytest.mark.parametrize("case", list(CASES))
def test_fwd_matches_reference(qkv, case):
    q, k, v, so = qkv
    ctx, tgt, kw = CASES[case]
    aux = (
        so,
        None if ctx is None else jnp.asarray(ctx),
        None if tgt is None else jnp.asarray(tgt),
    )
    out = hstu_attn_varlen(
        q, k, v, aux, max_seqlen=N, alpha=0.08, scaling_seqlen=N,
        interpret=True, **kw,
    )
    ref = hstu_mha_reference(
        N, 0.08, q, k, v, so,
        causal=kw.get("causal", True),
        num_targets=aux[2], num_contextuals=aux[1],
        max_attn_len=kw.get("max_attn_len", 0),
        target_group_size=kw.get("target_group_size", 1),
        scaling_seqlen=N,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_bwd_matches_reference(qkv):
    q, k, v, so = qkv
    ctx = jnp.asarray(np.array([3, 2, 0], np.int32))
    tgt = jnp.asarray(np.array([10, 4, 6], np.int32))
    aux = (so, ctx, tgt)
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((T, H, D)).astype(np.float32))

    def f_pallas(q, k, v):
        return jnp.sum(
            hstu_attn_varlen(
                q, k, v, aux, max_seqlen=N, alpha=0.08, scaling_seqlen=N,
                target_group_size=2, interpret=True,
            ) * w
        )

    def f_ref(q, k, v):
        return jnp.sum(
            hstu_mha_reference(
                N, 0.08, q, k, v, so, causal=True, num_targets=tgt,
                num_contextuals=ctx, target_group_size=2, scaling_seqlen=N,
            ) * w
        )

    gp = jax.grad(f_pallas, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        rel = np.abs(np.asarray(a) - np.asarray(b)).max() / (
            np.abs(np.asarray(b)).max() + 1e-9
        )
        assert rel < 1e-4


def test_rab_fwd_and_drab_match_reference():
    """rab forward + (dq,dk,dv,drab) grads vs the dense reference
    (reference contract: hstu_attn_varlen_func rab/has_drab,
    corelib/hstu/hstu_attn/hstu_attn_interface.py:185)."""
    from recsys_examples_tpu.ops.pallas.hstu_attention import (
        hstu_attn_varlen_rab,
    )

    B, N, H, D = 2, 256, 2, 128
    T = 512
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    offs = jnp.asarray([0, 200, 456], jnp.int32)  # lens 200, 256 <= N
    q = jax.random.normal(ks[0], (T, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (T, H, D), jnp.float32)
    v = jax.random.normal(ks[2], (T, H, D), jnp.float32)
    rab = jax.random.normal(ks[3], (B, H, N, N), jnp.float32) * 0.3
    aux = (offs, None, None)

    def kern(q, k, v, rab):
        return hstu_attn_varlen_rab(
            q, k, v, rab, aux, max_seqlen=N, alpha=0.08, causal=True,
            interpret=True,
        ).astype(jnp.float32)

    def ref(q, k, v, rab):
        return hstu_mha_reference(
            N, 0.08, q, k, v, offs, causal=True, rab=rab
        ).astype(jnp.float32)

    out_k = kern(q, k, v, rab)
    out_r = ref(q, k, v, rab)
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_r), rtol=2e-4, atol=2e-4
    )

    seed = jax.random.normal(jax.random.PRNGKey(9), out_k.shape)
    gk = jax.grad(lambda *a: (kern(*a) * seed).sum(), argnums=(0, 1, 2, 3))(
        q, k, v, rab
    )
    gr = jax.grad(lambda *a: (ref(*a) * seed).sum(), argnums=(0, 1, 2, 3))(
        q, k, v, rab
    )
    for a, b, name in zip(gk, gr, ["dq", "dk", "dv", "drab"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4,
            err_msg=name,
        )


def test_rab_broadcast_batch_head():
    """rab with broadcast batch dim accumulates drab correctly."""
    from recsys_examples_tpu.ops.pallas.hstu_attention import (
        hstu_attn_varlen_rab,
    )

    N, H, D = 128, 2, 128
    T = 256
    ks = jax.random.split(jax.random.PRNGKey(11), 4)
    offs = jnp.asarray([0, 100, 228], jnp.int32)
    q = jax.random.normal(ks[0], (T, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (T, H, D), jnp.float32)
    v = jax.random.normal(ks[2], (T, H, D), jnp.float32)
    rab = jax.random.normal(ks[3], (1, H, N, N), jnp.float32) * 0.2
    aux = (offs, None, None)

    def kern(rab):
        return hstu_attn_varlen_rab(
            q, k, v, rab, aux, max_seqlen=N, alpha=0.1, interpret=True
        ).astype(jnp.float32).sum()

    def ref(rab):
        return hstu_mha_reference(
            N, 0.1, q, k, v, offs, causal=True, rab=rab
        ).astype(jnp.float32).sum()

    gk = jax.grad(kern)(rab)
    gr = jax.grad(ref)(rab)
    assert gk.shape == rab.shape
    np.testing.assert_allclose(
        np.asarray(gk), np.asarray(gr), rtol=3e-4, atol=3e-4
    )


def test_quantized_int8_forward_close_to_fp():
    """Int8 per-tensor quantized forward vs fp reference (reference: FP8
    quantization modes of hstu_attn_varlen_func — per-tensor analogue)."""
    from recsys_examples_tpu.ops.pallas.hstu_attention import (
        hstu_attn_varlen_quantized_calibrated,
        quantize_per_tensor,
    )

    N, H, D, T = 256, 2, 128, 512
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    offs = jnp.asarray([0, 200, 456], jnp.int32)
    q = jax.random.normal(ks[0], (T, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (T, H, D), jnp.float32)
    v = jax.random.normal(ks[2], (T, H, D), jnp.float32)
    aux = (offs, None, None)
    qi, sq = quantize_per_tensor(q)
    ki_, sk = quantize_per_tensor(k)
    vi, sv = quantize_per_tensor(v)
    got = hstu_attn_varlen_quantized_calibrated(
        qi, ki_, vi, sq, sk, sv, aux, max_seqlen=N, alpha=0.08,
        causal=True, interpret=True,
    )
    want = hstu_mha_reference(N, 0.08, q, k, v, offs, causal=True)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
    denom = np.abs(np.asarray(want, np.float32)).mean() + 1e-6
    assert err.mean() / denom < 0.05, (err.mean(), denom)


def test_aligned_mode_matches_packed(qkv):
    """input_aligned=True (block-aligned layout in/out) must agree with the
    packed path for values AND grads, including zeroed junk rows."""
    from recsys_examples_tpu.ops.pallas.hstu_attention import (
        attn_alignment,
    )

    q, k, v, so = qkv
    aux = (so, None, None)

    lay = attn_alignment(so, T)
    qa = lay.to_aligned(q.reshape(T, H * D)).reshape(-1, H, D)
    ka = lay.to_aligned(k.reshape(T, H * D)).reshape(-1, H, D)
    va = lay.to_aligned(v.reshape(T, H * D)).reshape(-1, H, D)

    def f_packed(q, k, v):
        return hstu_attn_varlen(
            q, k, v, aux, max_seqlen=N, alpha=0.08, scaling_seqlen=N,
            interpret=True,
        )

    def f_aligned(qa, ka, va):
        return hstu_attn_varlen(
            qa, ka, va, aux, max_seqlen=N, alpha=0.08, scaling_seqlen=N,
            interpret=True, input_aligned=True, packed_total=T,
        )

    out_p = f_packed(q, k, v)
    out_a = f_aligned(qa, ka, va)
    np.testing.assert_allclose(
        np.asarray(lay.to_packed(out_a.reshape(-1, H * D))),
        np.asarray(out_p.reshape(T, H * D)), rtol=1e-4, atol=1e-5,
    )
    # junk rows zeroed in aligned output
    valid = np.asarray(lay.valid_rows)
    oa = np.asarray(out_a.reshape(-1, H * D))
    assert np.all(oa[~valid] == 0)

    # grads agree after relayout
    g_p = jax.grad(lambda *a: f_packed(*a).astype(jnp.float32).sum(),
                   argnums=(0, 1, 2))(q, k, v)
    g_a = jax.grad(lambda *a: f_aligned(*a).astype(jnp.float32).sum(),
                   argnums=(0, 1, 2))(qa, ka, va)
    for dp, da in zip(g_p, g_a):
        np.testing.assert_allclose(
            np.asarray(lay.to_packed(da.reshape(-1, H * D))),
            np.asarray(dp.reshape(T, H * D)), rtol=1e-3, atol=1e-4,
        )
        daf = np.asarray(da.reshape(-1, H * D))
        assert np.all(daf[~valid] == 0)
