"""HSTU inference path: running incrementally with a KV cache must produce
the same activations as running from scratch (reference test model:
examples/hstu/test/test_hstu_block_inference.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recsys_examples_tpu.inference.hstu_inference import (
    HSTUBlockInference,
    strip_cached_tokens,
)
from recsys_examples_tpu.modules.config import HSTUConfig, KernelBackend

CFG = HSTUConfig(
    hidden_size=32,
    num_layers=2,
    num_attention_heads=2,
    kv_channels=16,
    hidden_dropout=0.0,
    kernel_backend=KernelBackend.JNP,
    dtype=jnp.float32,
)


def test_incremental_matches_scratch():
    rng = np.random.default_rng(0)
    B, N, D = 2, 12, 32
    L, H, dh = CFG.num_layers, 2, 16
    P = 7  # cached prefix length
    lens = jnp.asarray([12, 10], jnp.int32)
    x = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    # zero out padding
    mask = (jnp.arange(N)[None, :] < lens[:, None])[:, :, None]
    x = jnp.where(mask, x, 0.0)

    block = HSTUBlockInference(CFG)
    empty_k = jnp.zeros((L, B, 0, H, dh), jnp.float32)
    zero_len = jnp.zeros((B,), jnp.int32)
    params = block.init(
        jax.random.PRNGKey(0), x, empty_k, empty_k, zero_len, lens, None, N
    )["params"]

    # from scratch: everything "new"
    out_full, k_full, v_full = block.apply(
        {"params": params}, x, empty_k, empty_k, zero_len, lens, None, N
    )

    # phase 1: prefix only
    pre_lens = jnp.minimum(lens, P)
    out_pre, k_pre, v_pre = block.apply(
        {"params": params}, x[:, :P], empty_k, empty_k, zero_len,
        pre_lens, None, N,
    )
    np.testing.assert_allclose(
        np.asarray(out_pre[0]), np.asarray(out_full[0, :P]),
        rtol=1e-5, atol=1e-5,
    )

    # phase 2: suffix with cached prefix KV
    suf = x[:, P:]
    suf_lens = jnp.maximum(lens - P, 0)
    out_suf, _, _ = block.apply(
        {"params": params}, suf, k_pre, v_pre, pre_lens, suf_lens, None, N
    )
    for b in range(B):
        n_new = int(suf_lens[b])
        np.testing.assert_allclose(
            np.asarray(out_suf[b, :n_new]),
            np.asarray(out_full[b, P:P + n_new]),
            rtol=1e-4, atol=1e-5,
        )


def test_strip_cached_tokens():
    vals = jnp.arange(24, dtype=jnp.float32).reshape(2, 6, 2)
    lengths = jnp.asarray([6, 4], jnp.int32)
    cached = jnp.asarray([2, 3], jnp.int32)
    out, new_lens = strip_cached_tokens(vals, lengths, cached, max_new=4)
    np.testing.assert_array_equal(np.asarray(new_lens), [4, 1])
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(vals[0, 2:6]))
    np.testing.assert_allclose(np.asarray(out[1, 0]), np.asarray(vals[1, 3]))
    np.testing.assert_array_equal(np.asarray(out[1, 1:]), 0)
