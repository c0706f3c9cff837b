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
