"""Qwen3 decoder backbone for SID-GR serving (TPU-native, flax).

Counterpart of the reference's real-weight serving model
(examples/sid-gr-inference/src/gr_inference/gr_models/qwen3/{model,layers,
weights,config}.py): RMSNorm, per-head QK-norm fused with RoPE, GQA
(num_kv_heads < num_heads), SwiGLU MLP, optional tied embedding head.

Serving path mirrors the reference's engine contract:
  - `prefill`: full causal pass over [B, N] token ids -> per-layer context
    KV + last-position hidden states.
  - `decode_step`: one beam step through the fused Pallas beam-decode
    attention (ops/pallas/beam_decode_attention.py) — context KV is read
    once per batch, beam KV is resolved by ancestry indices (the
    reference's gr_decode_atten contract).

Weight loading: `load_hf_weights` maps a HuggingFace Qwen3 checkpoint
(safetensors dir, e.g. Qwen3-1.7B) onto this module's parameter tree
(reference twin: gr_models/qwen3/weights.py loader).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from recsys_examples_tpu.ops.pallas.beam_decode_attention import (
    beam_decode_attn,
)


@dataclasses.dataclass(frozen=True)
class Qwen3Config:
    """(reference: gr_models/qwen3/config.py; defaults = Qwen3-1.7B)"""
    vocab_size: int = 151_936
    hidden_size: int = 2048
    num_layers: int = 28
    num_heads: int = 16
    num_kv_heads: int = 8
    head_dim: int = 128
    intermediate_size: int = 6144
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    tie_word_embeddings: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @staticmethod
    def tiny(vocab_size: int = 512) -> "Qwen3Config":
        """Small config for tests."""
        return Qwen3Config(
            vocab_size=vocab_size, hidden_size=64, num_layers=2,
            num_heads=4, num_kv_heads=2, head_dim=16,
            intermediate_size=128, dtype=jnp.float32,
        )


def _rms_norm(x, weight, eps):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32))


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float):
    """[.., P] int32 -> cos/sin [.., P, head_dim/2] (float32)."""
    half = head_dim // 2
    freq = 1.0 / (
        theta ** (jnp.arange(0, half, dtype=jnp.float32) / half)
    )
    ang = positions.astype(jnp.float32)[..., None] * freq
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x [..., P, H, D]; cos/sin [..., P, D/2]. HF 'rotate_half' convention:
    first/second halves of the head dim are the rotation pairs."""
    half = x.shape[-1] // 2
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:].astype(jnp.float32)
    c = cos[..., None, :]
    s = sin[..., None, :]
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(x.dtype)


class Qwen3Attention(nn.Module):
    config: Qwen3Config

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                 # [B, P, D] or [B, W, D] (decode)
        positions: jax.Array,         # [B, P] token positions
        mask: Optional[jax.Array] = None,   # [B, P, P] bool (prefill)
        beam_ctx: Optional[dict] = None,    # decode-step inputs
    ):
        cfg = self.config
        H, Hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        B, P, _ = x.shape
        q = nn.Dense(H * dh, use_bias=False, dtype=cfg.dtype, name="q_proj")(x)
        k = nn.Dense(Hkv * dh, use_bias=False, dtype=cfg.dtype, name="k_proj")(x)
        v = nn.Dense(Hkv * dh, use_bias=False, dtype=cfg.dtype, name="v_proj")(x)
        q = q.reshape(B, P, H, dh)
        k = k.reshape(B, P, Hkv, dh)
        v = v.reshape(B, P, Hkv, dh)
        # per-head QK RMSNorm (Qwen3 signature feature), then RoPE — the
        # reference fuses these (gr_models/qwen3: fused_qk_norm_rope)
        qn = self.param("q_norm", nn.initializers.ones, (dh,))
        kn = self.param("k_norm", nn.initializers.ones, (dh,))
        q = _rms_norm(q, qn, cfg.rms_norm_eps).astype(cfg.dtype)
        k = _rms_norm(k, kn, cfg.rms_norm_eps).astype(cfg.dtype)
        cos, sin = rope_cos_sin(positions, dh, cfg.rope_theta)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        if beam_ctx is not None:
            # decode: P is the beam axis; attend ctx + beam via the fused
            # kernel; self KV appended with identity ancestry
            W = P
            ident = jnp.broadcast_to(
                jnp.arange(W, dtype=jnp.int32)[None, None], (B, 1, W)
            )
            if beam_ctx.get("k_beam") is not None:
                kb = jnp.concatenate(
                    [beam_ctx["k_beam"], k[:, None, :, :, :]], axis=1
                )
                vb = jnp.concatenate(
                    [beam_ctx["v_beam"], v[:, None, :, :, :]], axis=1
                )
                anc = jnp.concatenate([beam_ctx["ancestry"], ident], axis=1)
            else:
                kb = k[:, None]
                vb = v[:, None]
                anc = ident
            out = beam_decode_attn(
                q, beam_ctx["k_ctx"], beam_ctx["v_ctx"],
                beam_ctx["ctx_lens"], kb, vb, anc,
                sm_scale=dh ** -0.5, backend=beam_ctx.get("backend", "auto"),
            ).astype(cfg.dtype)
            o = nn.Dense(
                cfg.hidden_size, use_bias=False, dtype=cfg.dtype,
                name="o_proj",
            )(out.reshape(B, W, H * dh))
            return o, (k, v)

        # prefill: dense causal attention (GQA by kv-head repeat)
        G = H // Hkv
        kr = jnp.repeat(k, G, axis=2)
        vr = jnp.repeat(v, G, axis=2)
        sc = jnp.einsum(
            "bqhd,bkhd->bhqk", q, kr, preferred_element_type=jnp.float32
        ) * (dh ** -0.5)
        if mask is not None:
            sc = jnp.where(mask[:, None], sc, -1e30)
        p = jax.nn.softmax(sc, axis=-1).astype(cfg.dtype)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", p, vr, preferred_element_type=jnp.float32
        ).astype(cfg.dtype)
        o = nn.Dense(
            cfg.hidden_size, use_bias=False, dtype=cfg.dtype, name="o_proj"
        )(out.reshape(B, P, H * dh))
        return o, (k, v)


class Qwen3MLP(nn.Module):
    config: Qwen3Config

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        g = nn.Dense(cfg.intermediate_size, use_bias=False, dtype=cfg.dtype,
                     name="gate_proj")(x)
        u = nn.Dense(cfg.intermediate_size, use_bias=False, dtype=cfg.dtype,
                     name="up_proj")(x)
        return nn.Dense(cfg.hidden_size, use_bias=False, dtype=cfg.dtype,
                        name="down_proj")(nn.silu(g) * u)


class Qwen3Layer(nn.Module):
    config: Qwen3Config

    @nn.compact
    def __call__(self, x, positions, mask=None, beam_ctx=None):
        cfg = self.config
        w1 = self.param("input_layernorm", nn.initializers.ones,
                        (cfg.hidden_size,))
        h = _rms_norm(x, w1, cfg.rms_norm_eps).astype(cfg.dtype)
        attn, kv = Qwen3Attention(cfg, name="self_attn")(
            h, positions, mask=mask, beam_ctx=beam_ctx
        )
        x = x + attn
        w2 = self.param("post_attention_layernorm", nn.initializers.ones,
                        (cfg.hidden_size,))
        h = _rms_norm(x, w2, cfg.rms_norm_eps).astype(cfg.dtype)
        x = x + Qwen3MLP(cfg, name="mlp")(h)
        return x, kv


class Qwen3Model(nn.Module):
    """Decoder stack with prefill / beam-decode entry points."""

    config: Qwen3Config

    def setup(self):
        cfg = self.config
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
            name="embed_tokens",
        )
        self.layers = [
            Qwen3Layer(cfg, name=f"layer_{i}") for i in range(cfg.num_layers)
        ]
        self.final_norm = self.param(
            "norm", nn.initializers.ones, (cfg.hidden_size,)
        )
        if not cfg.tie_word_embeddings:
            self.lm_head = nn.Dense(
                cfg.vocab_size, use_bias=False, dtype=jnp.float32,
                name="lm_head",
            )

    def _logits(self, h):
        cfg = self.config
        h = _rms_norm(h, self.final_norm, cfg.rms_norm_eps)
        if cfg.tie_word_embeddings:
            return h @ self.embed_tokens.embedding.astype(jnp.float32).T
        return self.lm_head(h.astype(cfg.dtype)).astype(jnp.float32)

    def prefill(self, tokens: jax.Array, lengths: jax.Array):
        """tokens [B, N] int32, lengths [B] -> (last_logits [B, V],
        ctx_kv: list of (k, v) [B, N, Hkv, dh])."""
        cfg = self.config
        B, N = tokens.shape
        x = self.embed_tokens(tokens)
        pos = jnp.arange(N, dtype=jnp.int32)[None, :].repeat(B, 0)
        ar = jnp.arange(N, dtype=jnp.int32)
        causal = ar[None, :, None] >= ar[None, None, :]
        valid = (ar[None, :] < lengths[:, None])
        mask = causal & valid[:, :, None] & valid[:, None, :]
        kvs = []
        for layer in self.layers:
            x, kv = layer(x, pos, mask=mask)
            kvs.append(kv)
        last = x[jnp.arange(B), jnp.maximum(lengths - 1, 0)]
        return self._logits(last), kvs

    def decode_step(
        self,
        tokens: jax.Array,       # [B, W] current beam tokens
        positions: jax.Array,    # [B, W] their positions
        ctx_kv: List[Tuple[jax.Array, jax.Array]],
        ctx_lens: jax.Array,
        beam_kv: Optional[List[Tuple[jax.Array, jax.Array]]],
        ancestry: Optional[jax.Array],
        backend: str = "auto",
    ):
        """One beam step. Returns (logits [B, W, V], new per-layer (k, v))."""
        x = self.embed_tokens(tokens)
        new_kv = []
        for li, layer in enumerate(self.layers):
            beam_ctx = {
                "k_ctx": ctx_kv[li][0], "v_ctx": ctx_kv[li][1],
                "ctx_lens": ctx_lens,
                "k_beam": None if beam_kv is None else beam_kv[li][0],
                "v_beam": None if beam_kv is None else beam_kv[li][1],
                "ancestry": ancestry,
                "backend": backend,
            }
            x, kv = layer(x, positions, beam_ctx=beam_ctx)
            new_kv.append(kv)
        return self._logits(x), new_kv

    def __call__(self, tokens, lengths):
        return self.prefill(tokens, lengths)


# ------------------------------------------------------------ weights

_HF_LAYER_MAP = {
    "self_attn.q_proj.weight": ("self_attn", "q_proj", "kernel"),
    "self_attn.k_proj.weight": ("self_attn", "k_proj", "kernel"),
    "self_attn.v_proj.weight": ("self_attn", "v_proj", "kernel"),
    "self_attn.o_proj.weight": ("self_attn", "o_proj", "kernel"),
    "self_attn.q_norm.weight": ("self_attn", "q_norm"),
    "self_attn.k_norm.weight": ("self_attn", "k_norm"),
    "mlp.gate_proj.weight": ("mlp", "gate_proj", "kernel"),
    "mlp.up_proj.weight": ("mlp", "up_proj", "kernel"),
    "mlp.down_proj.weight": ("mlp", "down_proj", "kernel"),
    "input_layernorm.weight": ("input_layernorm",),
    "post_attention_layernorm.weight": ("post_attention_layernorm",),
}


def load_hf_weights(path: str, cfg: Qwen3Config) -> dict:
    """Map a HuggingFace Qwen3 safetensors checkpoint directory onto this
    module's flax param tree (reference: gr_models/qwen3/weights.py).
    Linear `.weight` tensors are transposed to flax kernel layout."""
    from safetensors import safe_open

    files = sorted(
        f for f in os.listdir(path) if f.endswith(".safetensors")
    )
    tensors: Dict[str, np.ndarray] = {}
    for f in files:
        with safe_open(os.path.join(path, f), framework="np") as sf:
            for k in sf.keys():
                tensors[k] = sf.get_tensor(k)

    params: dict = {}

    def put(tree_path, value):
        node = params
        for p in tree_path[:-1]:
            node = node.setdefault(p, {})
        node[tree_path[-1]] = jnp.asarray(value, cfg.dtype)

    put(("embed_tokens", "embedding"), tensors["model.embed_tokens.weight"])
    put(("norm",), tensors["model.norm.weight"])
    if not cfg.tie_word_embeddings and "lm_head.weight" in tensors:
        put(("lm_head", "kernel"), tensors["lm_head.weight"].T)
    for i in range(cfg.num_layers):
        for hf_key, tree in _HF_LAYER_MAP.items():
            t = tensors[f"model.layers.{i}.{hf_key}"]
            if tree[-1] == "kernel":
                t = t.T
            put((f"layer_{i}",) + tree, t)
    return params
