"""Qwen3 backbone + beam runtime: KV-cached decode must match the no-KV
baseline (reference test model: sid-gr-inference tests +
examples/sid_gr/tests/test_beam_decode_generate.py overlap assertion)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recsys_examples_tpu.inference.sid_serving.qwen3_runtime import (
    qwen3_generate_beam,
    qwen3_generate_reference,
)
from recsys_examples_tpu.models.qwen3 import Qwen3Config, Qwen3Model


@pytest.fixture(scope="module")
def model_and_params():
    cfg = Qwen3Config.tiny(vocab_size=64)
    model = Qwen3Model(cfg)
    tokens = jnp.zeros((2, 8), jnp.int32)
    lengths = jnp.asarray([8, 8], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens, lengths)
    return model, params


def test_prefill_shapes_and_padding(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 64, size=(2, 10)), jnp.int32)
    lengths = jnp.asarray([10, 6], jnp.int32)
    logits, kvs = model.apply(params, tokens, lengths,
                              method=Qwen3Model.prefill)
    assert logits.shape == (2, 64)
    assert len(kvs) == model.config.num_layers
    assert kvs[0][0].shape == (2, 10, 2, 16)
    # padding-invariance: extending the padded tail must not change logits
    tokens2 = tokens.at[1, 6:].set(63)
    logits2, _ = model.apply(params, tokens2, lengths,
                             method=Qwen3Model.prefill)
    np.testing.assert_allclose(
        np.asarray(logits[1]), np.asarray(logits2[1]), rtol=1e-5, atol=1e-5
    )


def test_beam_decode_matches_reference(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, 64, size=(2, 12)), jnp.int32)
    lengths = jnp.asarray([12, 7], jnp.int32)
    paths_kv, scores_kv = qwen3_generate_beam(
        model, params, tokens, lengths, num_steps=3, beam_width=4,
        backend="jnp",
    )
    paths_ref, scores_ref = qwen3_generate_reference(
        model, params, tokens, lengths, num_steps=3, beam_width=4,
    )
    np.testing.assert_allclose(
        np.asarray(scores_kv), np.asarray(scores_ref), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(paths_kv), np.asarray(paths_ref))


def test_constrained_decoding_mask(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(2)
    tokens = jnp.asarray(rng.integers(0, 64, size=(1, 6)), jnp.int32)
    lengths = jnp.asarray([6], jnp.int32)

    def mask_fn(step, paths):
        # only tokens [step*8, step*8+8) allowed at each step
        B = 1
        W = 4 if step > 0 else 4
        allowed = jnp.zeros((64,), jnp.float32) - 1e30
        allowed = allowed.at[step * 8:(step + 1) * 8].set(0.0)
        return jnp.broadcast_to(allowed[None, None], (B, W, 64))

    paths, scores = qwen3_generate_beam(
        model, params, tokens, lengths, num_steps=3, beam_width=4,
        logits_mask_fn=mask_fn, backend="jnp",
    )
    p = np.asarray(paths)
    for h in range(3):
        assert ((p[:, :, h] >= h * 8) & (p[:, :, h] < (h + 1) * 8)).all()


def test_logits_processor_chain_in_decode(model_and_params):
    """The gr_runtime-style processor pipeline composes with the KV
    decode loop: token suppression must keep banned tokens out of every
    returned path, and temperature must not change the argmax path."""
    from recsys_examples_tpu.inference.sid_serving.logits_processor import (
        make_chain,
        processors_from_specs,
    )

    model, params = model_and_params
    rng = np.random.default_rng(4)
    tokens = jnp.asarray(rng.integers(0, 64, size=(2, 6)), jnp.int32)
    lengths = jnp.asarray([6, 4], jnp.int32)
    banned = list(range(32, 64))
    chain = processors_from_specs(
        [{"type": "token_suppress", "token_ids": banned}]
    )
    paths, scores = qwen3_generate_beam(
        model, params, tokens, lengths, num_steps=3, beam_width=4,
        logits_processor=chain, backend="jnp",
    )
    assert (np.asarray(paths) < 32).all()
    assert np.isfinite(np.asarray(scores)).any()
    # top-k=1 collapses each expansion to its row-argmax: every surviving
    # beam's step tokens must come from the allowed (non-banned) range
    # and the chain composes (suppress THEN top-k)
    chain2 = make_chain(top_k=1)
    from recsys_examples_tpu.inference.sid_serving.logits_processor import (
        LogitsProcessorChain,
    )
    combo = LogitsProcessorChain(tuple(chain.processors) +
                                 tuple(chain2.processors))
    p2, s2 = qwen3_generate_beam(
        model, params, tokens, lengths, num_steps=3, beam_width=4,
        logits_processor=combo, backend="jnp",
    )
    assert (np.asarray(p2) < 32).all()
    # with k=1 only one child per parent survives -> at most W distinct
    # finite-score beams, the rest are -inf
    assert np.isfinite(np.asarray(s2)).sum() >= 2


def test_hf_weight_loader_roundtrip(tmp_path, model_and_params):
    """Write a synthetic HF-format checkpoint, load it, and check the
    mapped tree matches the module's own param structure."""
    st = pytest.importorskip("safetensors.numpy")
    model, params = model_and_params
    cfg = model.config
    rng = np.random.default_rng(3)
    tensors = {
        "model.embed_tokens.weight": rng.normal(
            size=(cfg.vocab_size, cfg.hidden_size)
        ).astype(np.float32),
        "model.norm.weight": np.ones((cfg.hidden_size,), np.float32),
    }
    H, Hkv, dh, D, I = (cfg.num_heads, cfg.num_kv_heads, cfg.head_dim,
                        cfg.hidden_size, cfg.intermediate_size)
    for i in range(cfg.num_layers):
        pre = f"model.layers.{i}."
        tensors[pre + "self_attn.q_proj.weight"] = rng.normal(
            size=(H * dh, D)).astype(np.float32)
        tensors[pre + "self_attn.k_proj.weight"] = rng.normal(
            size=(Hkv * dh, D)).astype(np.float32)
        tensors[pre + "self_attn.v_proj.weight"] = rng.normal(
            size=(Hkv * dh, D)).astype(np.float32)
        tensors[pre + "self_attn.o_proj.weight"] = rng.normal(
            size=(D, H * dh)).astype(np.float32)
        tensors[pre + "self_attn.q_norm.weight"] = np.ones((dh,), np.float32)
        tensors[pre + "self_attn.k_norm.weight"] = np.ones((dh,), np.float32)
        tensors[pre + "mlp.gate_proj.weight"] = rng.normal(
            size=(I, D)).astype(np.float32)
        tensors[pre + "mlp.up_proj.weight"] = rng.normal(
            size=(I, D)).astype(np.float32)
        tensors[pre + "mlp.down_proj.weight"] = rng.normal(
            size=(D, I)).astype(np.float32)
        tensors[pre + "input_layernorm.weight"] = np.ones((D,), np.float32)
        tensors[pre + "post_attention_layernorm.weight"] = np.ones(
            (D,), np.float32)
    st.save_file(tensors, str(tmp_path / "model.safetensors"))

    from recsys_examples_tpu.models.qwen3 import load_hf_weights

    loaded = load_hf_weights(str(tmp_path), cfg)
    want = jax.tree.structure(params["params"])
    got = jax.tree.structure(loaded)
    assert want == got, f"\n{want}\n!=\n{got}"
    # loaded weights drive a forward pass
    tokens = jnp.zeros((1, 4), jnp.int32)
    logits, _ = model.apply(
        {"params": loaded}, tokens, jnp.asarray([4], jnp.int32),
        method=Qwen3Model.prefill,
    )
    assert np.isfinite(np.asarray(logits)).all()


def test_qwen3_serving_engine(model_and_params):
    from recsys_examples_tpu.inference.sid_serving.engine import (
        Qwen3ServingEngine,
        ServingConfig,
    )

    model, params = model_and_params
    cfg = ServingConfig(beam_width=4, ctx_buckets=(16,), batch_buckets=(2,))
    eng = Qwen3ServingEngine(model, params, cfg, num_steps=3,
                             attn_backend="jnp")
    rng = np.random.default_rng(4)
    ctxs = [rng.integers(0, 64, size=(9,)).astype(np.int32),
            rng.integers(0, 64, size=(13,)).astype(np.int32)]
    paths, scores = eng.generate(ctxs)
    assert paths.shape == (2, 4, 3)
    assert scores.shape == (2, 4)
    # replay hits the compiled executable (no growth in compile count)
    n = eng.compile_count
    eng.generate(ctxs)
    assert eng.compile_count == n


def test_hf_loader_logit_parity_vs_numpy_twin(tmp_path):
    """Load a synthetic HF-layout checkpoint (RANDOM weights incl. norms)
    and assert logits match an independent numpy reimplementation of the
    HF Qwen3 forward (y = x @ W.T, fp32 RMSNorm, per-head QK-norm,
    rotate_half RoPE, GQA). A transpose or convention slip in
    load_hf_weights cannot pass this (VERDICT r3 #7; reference:
    gr_models/qwen3/weights.py validated against Qwen3-1.7B)."""
    st = pytest.importorskip("safetensors.numpy")
    from recsys_examples_tpu.models.qwen3 import (
        Qwen3Config,
        Qwen3Model,
        load_hf_weights,
    )

    cfg = Qwen3Config.tiny(vocab_size=97)
    rng = np.random.default_rng(11)
    H, Hkv, dh, D, I = (cfg.num_heads, cfg.num_kv_heads, cfg.head_dim,
                        cfg.hidden_size, cfg.intermediate_size)

    def w(*shape, scale=0.08):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    tensors = {
        "model.embed_tokens.weight": w(cfg.vocab_size, D, scale=0.3),
        "model.norm.weight": w(D, scale=1.0) + 1.0,
    }
    for i in range(cfg.num_layers):
        pre = f"model.layers.{i}."
        tensors[pre + "self_attn.q_proj.weight"] = w(H * dh, D)
        tensors[pre + "self_attn.k_proj.weight"] = w(Hkv * dh, D)
        tensors[pre + "self_attn.v_proj.weight"] = w(Hkv * dh, D)
        tensors[pre + "self_attn.o_proj.weight"] = w(D, H * dh)
        tensors[pre + "self_attn.q_norm.weight"] = w(dh, scale=0.5) + 1.0
        tensors[pre + "self_attn.k_norm.weight"] = w(dh, scale=0.5) + 1.0
        tensors[pre + "mlp.gate_proj.weight"] = w(I, D)
        tensors[pre + "mlp.up_proj.weight"] = w(I, D)
        tensors[pre + "mlp.down_proj.weight"] = w(D, I)
        tensors[pre + "input_layernorm.weight"] = w(D, scale=0.5) + 1.0
        tensors[pre + "post_attention_layernorm.weight"] = (
            w(D, scale=0.5) + 1.0
        )
    st.save_file(tensors, str(tmp_path / "model.safetensors"))

    # ---- independent numpy twin of the HF forward
    def rms(x, g, eps=cfg.rms_norm_eps):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * g

    def rope(x, pos, theta=cfg.rope_theta):
        # x [P, H, dh]; HF rotate_half: q*cos + [-x2, x1]*sin with
        # cos/sin = concat([cos(ang)]*2) over the head dim
        half = x.shape[-1] // 2
        freq = 1.0 / theta ** (np.arange(half) / half)
        ang = pos[:, None] * freq                       # [P, half]
        c = np.cos(ang)[:, None, :]
        s = np.sin(ang)[:, None, :]
        x1, x2 = x[..., :half], x[..., half:]
        return np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)

    def twin_forward(tokens):
        P = len(tokens)
        pos = np.arange(P, dtype=np.float64)
        x = tensors["model.embed_tokens.weight"][tokens].astype(np.float64)
        for i in range(cfg.num_layers):
            pre = f"model.layers.{i}."
            h = rms(x, tensors[pre + "input_layernorm.weight"])
            q = (h @ tensors[pre + "self_attn.q_proj.weight"].T
                 ).reshape(P, H, dh)
            k = (h @ tensors[pre + "self_attn.k_proj.weight"].T
                 ).reshape(P, Hkv, dh)
            v = (h @ tensors[pre + "self_attn.v_proj.weight"].T
                 ).reshape(P, Hkv, dh)
            q = rms(q, tensors[pre + "self_attn.q_norm.weight"])
            k = rms(k, tensors[pre + "self_attn.k_norm.weight"])
            q = rope(q, pos)
            k = rope(k, pos)
            kr = np.repeat(k, H // Hkv, axis=1)
            vr = np.repeat(v, H // Hkv, axis=1)
            sc = np.einsum("qhd,khd->hqk", q, kr) / np.sqrt(dh)
            causal = np.tril(np.ones((P, P), bool))
            sc = np.where(causal, sc, -1e30)
            p = np.exp(sc - sc.max(-1, keepdims=True))
            p = p / p.sum(-1, keepdims=True)
            att = np.einsum("hqk,khd->qhd", p, vr).reshape(P, H * dh)
            x = x + att @ tensors[pre + "self_attn.o_proj.weight"].T
            h = rms(x, tensors[pre + "post_attention_layernorm.weight"])
            g = h @ tensors[pre + "mlp.gate_proj.weight"].T
            u = h @ tensors[pre + "mlp.up_proj.weight"].T
            silu = g / (1.0 + np.exp(-g))
            x = x + (silu * u) @ tensors[pre + "mlp.down_proj.weight"].T
        h = rms(x[-1], tensors["model.norm.weight"])
        return h @ tensors["model.embed_tokens.weight"].T  # tied head

    tokens = rng.integers(0, cfg.vocab_size, size=(7,))
    want = twin_forward(tokens)

    model = Qwen3Model(cfg)
    loaded = load_hf_weights(str(tmp_path), cfg)
    logits, _ = model.apply(
        {"params": loaded},
        jnp.asarray(tokens, jnp.int32)[None, :],
        jnp.asarray([len(tokens)], jnp.int32),
        method=Qwen3Model.prefill,
    )
    got = np.asarray(logits)[0]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
