"""Causal transformer decoder blocks for SID-GR (softmax attention).

Counterpart of the reference decoder
(examples/sid_gr/model/gpt_model.py:93 `SIDGRDecoder` wrapping Megatron-Core
`TransformerBlock`, and the padded-dense mask path of
examples/sid_gr/model/attention_mask.py).

SID sequences are short (a few hundred tokens), so the decoder runs on the
padded dense [B, N, D] layout where XLA's batched matmuls are already near
peak; the jagged <-> dense conversion happens once around the whole stack.
KV-cached single/multi-token decode steps reuse the same weights.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from recsys_examples_tpu.ops.pallas.beam_decode_attention import (
    beam_decode_attn,
)


@dataclasses.dataclass
class BeamAttnInputs:
    """Per-layer inputs for the fused beam-decode attention step
    (reference: gr_decode_atten/interface.py:835 argument list)."""
    k_ctx: jax.Array            # [B, S, H, dh] prefill context keys
    v_ctx: jax.Array            # [B, S, H, dh]
    ctx_lens: jax.Array         # [B] int32
    k_beam: Optional[jax.Array]  # [B, N, W, H, dh] previous decode steps
    v_beam: Optional[jax.Array]
    ancestry: Optional[jax.Array]  # [B, N, W] int32
    backend: str = "auto"


def make_padded_causal_mask(
    lengths: jax.Array, N: int, bos_tail: Optional[jax.Array] = None
) -> jax.Array:
    """[B, N, N] bool causal mask limited to each sample's length
    (reference: attention_mask.py:19 `make_padded_causal_mask`)."""
    B = lengths.shape[0]
    pos = jnp.arange(N, dtype=jnp.int32)
    causal = pos[None, :, None] >= pos[None, None, :]
    valid = (pos[None, :] < lengths[:, None])[:, :, None] & (
        pos[None, :] < lengths[:, None]
    )[:, None, :]
    return causal & valid


class MultiHeadAttention(nn.Module):
    num_heads: int
    head_dim: int
    dtype: jax.typing.DTypeLike = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                      # [B, Nq, D]
        kv_x: Optional[jax.Array] = None,  # [B, Nk, D] (defaults to x)
        mask: Optional[jax.Array] = None,  # [B, Nq, Nk] bool
        kv_cache: Optional[Tuple[jax.Array, jax.Array]] = None,
        return_kv: bool = False,
        beam_attn: Optional[BeamAttnInputs] = None,
    ):
        D = x.shape[-1]
        H, dh = self.num_heads, self.head_dim
        kv_x = x if kv_x is None else kv_x
        q = nn.Dense(H * dh, dtype=self.dtype, name="q")(x)
        k = nn.Dense(H * dh, dtype=self.dtype, name="k")(kv_x)
        v = nn.Dense(H * dh, dtype=self.dtype, name="v")(kv_x)
        if beam_attn is not None:
            # beam-decode step: x is [B, W, D]; the new token's own K/V is
            # appended as the last beam step with identity ancestry.
            ba = beam_attn
            B, W = x.shape[:2]
            qb = q.reshape(B, W, H, dh)
            k_new = k.reshape(B, W, H, dh)
            v_new = v.reshape(B, W, H, dh)
            ident = jnp.broadcast_to(
                jnp.arange(W, dtype=jnp.int32)[None, None], (B, 1, W)
            )
            if ba.k_beam is not None and ba.k_beam.shape[1] > 0:
                kb = jnp.concatenate([ba.k_beam, k_new[:, None]], axis=1)
                vb = jnp.concatenate([ba.v_beam, v_new[:, None]], axis=1)
                anc = jnp.concatenate([ba.ancestry, ident], axis=1)
            else:
                kb, vb, anc = k_new[:, None], v_new[:, None], ident
            out = beam_decode_attn(
                qb, ba.k_ctx, ba.v_ctx, ba.ctx_lens, kb, vb, anc,
                sm_scale=1.0 / dh ** 0.5, backend=ba.backend,
            ).astype(self.dtype)
            out = nn.Dense(D, dtype=self.dtype, name="proj")(
                out.reshape(B, W, H * dh)
            )
            return out, (k_new, v_new)
        B, Nq = x.shape[:2]
        q = q.reshape(B, Nq, H, dh)
        k = k.reshape(B, -1, H, dh)
        v = v.reshape(B, -1, H, dh)
        if kv_cache is not None:
            ck, cv = kv_cache
            k = jnp.concatenate([ck, k], axis=1)
            v = jnp.concatenate([cv, v], axis=1)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / (dh ** 0.5)
        if mask is not None:
            scores = jnp.where(mask[:, None], scores, -1e30)
        p = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", p, v, preferred_element_type=jnp.float32
        ).astype(self.dtype)
        out = nn.Dense(D, dtype=self.dtype, name="proj")(
            out.reshape(B, Nq, H * dh)
        )
        if return_kv:
            return out, (k, v)
        return out


class TransformerBlock(nn.Module):
    num_heads: int
    head_dim: int
    ffn_hidden: int
    dropout: float = 0.0
    dtype: jax.typing.DTypeLike = jnp.float32

    @nn.compact
    def __call__(
        self, x, mask=None, kv_cache=None, return_kv=False, train=True,
        beam_attn=None,
    ):
        h = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        attn = MultiHeadAttention(
            self.num_heads, self.head_dim, self.dtype, name="attn"
        )(h, mask=mask, kv_cache=kv_cache, return_kv=return_kv,
          beam_attn=beam_attn)
        if return_kv or beam_attn is not None:
            attn, kv = attn
        if self.dropout > 0:
            attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        x = x + attn
        h = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        h = nn.Dense(self.ffn_hidden, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="fc2")(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        x = x + h
        if return_kv or beam_attn is not None:
            return x, kv
        return x


class TransformerStack(nn.Module):
    num_layers: int
    num_heads: int
    head_dim: int
    ffn_hidden: int
    dropout: float = 0.0
    dtype: jax.typing.DTypeLike = jnp.float32

    @nn.compact
    def __call__(
        self, x, mask=None, kv_caches=None, return_kv=False, train=True,
        beam_attn: Optional[List[BeamAttnInputs]] = None,
    ):
        new_kv = []
        for i in range(self.num_layers):
            blk = TransformerBlock(
                self.num_heads, self.head_dim, self.ffn_hidden,
                self.dropout, self.dtype, name=f"layer_{i}",
            )
            cache = None if kv_caches is None else kv_caches[i]
            ba = None if beam_attn is None else beam_attn[i]
            out = blk(
                x, mask=mask, kv_cache=cache, return_kv=return_kv,
                train=train, beam_attn=ba,
            )
            if return_kv or ba is not None:
                x, kv = out
                new_kv.append(kv)
            else:
                x = out
        x = nn.LayerNorm(dtype=self.dtype, name="final_ln")(x)
        if return_kv or beam_attn is not None:
            return x, new_kv
        return x
