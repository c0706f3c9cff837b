"""Paged HSTU delta attention: Pallas kernel (interpret) vs jnp twin vs the
dense delta_attention path (reference test model:
examples/hstu/test/test_paged_hstu_attn_kernel.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recsys_examples_tpu.inference.hstu_inference import delta_attention
from recsys_examples_tpu.ops.pallas.paged_hstu_attention import (
    paged_hstu_delta_attention,
    paged_hstu_delta_attention_ref,
)


def _case(key, B, S, H, dh, P, pg, maxp, with_targets):
    ks = jax.random.split(key, 9)
    q = jax.random.normal(ks[0], (B, S, H, dh), jnp.float32)
    k_pages = jax.random.normal(ks[1], (P, pg, H, dh), jnp.float32)
    v_pages = jax.random.normal(ks[2], (P, pg, H, dh), jnp.float32)
    # distinct pages per user
    perm = jax.random.permutation(ks[3], P)[: B * maxp].reshape(B, maxp)
    cached_len = jax.random.randint(ks[4], (B,), 0, maxp * pg, jnp.int32)
    new_k = jax.random.normal(ks[5], (B, S, H, dh), jnp.float32)
    new_v = jax.random.normal(ks[6], (B, S, H, dh), jnp.float32)
    new_lens = jax.random.randint(ks[7], (B,), 1, S + 1, jnp.int32)
    num_targets = (
        jax.random.randint(ks[8], (B,), 0, 3, jnp.int32)
        if with_targets else None
    )
    return (q, k_pages, v_pages, perm.astype(jnp.int32), cached_len,
            new_k, new_v, new_lens, num_targets)


@pytest.mark.parametrize("with_targets", [False, True])
def test_ref_matches_dense_delta(with_targets):
    """The paged jnp twin must equal the already-tested dense delta path."""
    B, S, H, dh, P, pg, maxp = 2, 4, 2, 8, 16, 8, 4
    args = _case(jax.random.PRNGKey(0), B, S, H, dh, P, pg, maxp,
                 with_targets)
    (q, k_pages, v_pages, pt, cached_len, new_k, new_v, new_lens,
     num_targets) = args
    alpha, scaling = 0.35, 64.0
    got = paged_hstu_delta_attention_ref(*args, alpha, scaling)

    # build the dense view: gather pages + splice new tokens at cached_len
    N = maxp * pg
    kc = k_pages[jnp.clip(pt, 0, P - 1)].reshape(B, N, H, dh)
    vc = v_pages[jnp.clip(pt, 0, P - 1)].reshape(B, N, H, dh)
    pos = jnp.arange(N, dtype=jnp.int32)[None, :]
    rel = pos - cached_len[:, None]
    is_new = (rel >= 0) & (rel < S)
    reli = jnp.clip(rel, 0, S - 1)
    kc = jnp.where(
        is_new[..., None, None],
        jnp.take_along_axis(new_k, reli[..., None, None], axis=1), kc,
    )
    vc = jnp.where(
        is_new[..., None, None],
        jnp.take_along_axis(new_v, reli[..., None, None], axis=1), vc,
    )
    q_pos = cached_len[:, None] + jnp.arange(S, dtype=jnp.int32)[None]
    kv_len = cached_len + new_lens
    want = delta_attention(
        q, kc, vc, q_pos, kv_len, num_targets, alpha, scaling
    )
    # delta_attention doesn't zero rows past new_lens; the paged twin does
    row_ok = (jnp.arange(S)[None] < new_lens[:, None])[..., None, None]
    want = jnp.where(row_ok, want, 0.0)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("with_targets", [False, True])
def test_pallas_matches_ref(with_targets):
    B, S, H, dh, P, pg, maxp = 2, 8, 2, 128, 12, 128, 4
    args = _case(jax.random.PRNGKey(1), B, S, H, dh, P, pg, maxp,
                 with_targets)
    alpha, scaling = 1.0 / dh ** 0.5, 256.0
    want = paged_hstu_delta_attention_ref(*args, alpha, scaling)
    got = paged_hstu_delta_attention(
        *args, alpha, scaling, backend="pallas", interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("with_targets", [False, True])
def test_pallas_int8_kv_matches_ref(with_targets):
    """int8 KV pages (halved page DMA, per-(token, head) scales folded
    into scores/probs) must match the bf16 reference within quantization
    noise (VERDICT r3 #6; reference: hstu_attn quantization_mode,
    hstu_attn_interface.py:185)."""
    from recsys_examples_tpu.ops.pallas.paged_hstu_attention import (
        quantize_kv_pages,
    )

    B, S, H, dh, P, pg, maxp = 2, 8, 2, 128, 12, 128, 4
    args = _case(jax.random.PRNGKey(2), B, S, H, dh, P, pg, maxp,
                 with_targets)
    (q, k_pages, v_pages, pt, cached_len, new_k, new_v, new_lens,
     num_targets) = args
    alpha, scaling = 1.0 / dh ** 0.5, 256.0
    want = paged_hstu_delta_attention_ref(*args, alpha, scaling)
    k8, v8, ksc, vsc = quantize_kv_pages(k_pages, v_pages)
    got = paged_hstu_delta_attention(
        q, k8, v8, pt, cached_len, new_k, new_v, new_lens, num_targets,
        alpha, scaling, k_scales=ksc, v_scales=vsc,
        backend="pallas", interpret=True,
    )
    err = np.abs(np.asarray(got) - np.asarray(want))
    scale = np.abs(np.asarray(want)).max()
    assert err.max() <= 0.02 * scale + 1e-3, (err.max(), scale)
    # and the jnp twin handles the quantized inputs identically
    got_j = paged_hstu_delta_attention(
        q, k8, v8, pt, cached_len, new_k, new_v, new_lens, num_targets,
        alpha, scaling, k_scales=ksc, v_scales=vsc, backend="jnp",
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(got_j), rtol=2e-4, atol=2e-4
    )
