"""HSTU inference with user-keyed KV cache (delta-q path).

Counterpart of the reference inference stack
(examples/hstu/model/inference_ranking_gr.py:46 `InferenceRankingGR`
.forward_with_kvcache:130 = kv lookup -> allocate -> onboard -> strip cached
tokens -> embeddings -> dense fwd; paged layer
examples/hstu/modules/paged_hstu_infer_layer.py:41).

Only the *new* (uncached) tokens run through the network; each layer
appends its new K/V to the paged cache and attends the new queries over
[cached ++ new] (delta-q mask semantics of `pytorch_cached_hstu_mha`,
pt_hstu_attention.py:229). Bucketed static shapes play the role of the
reference's CUDA-graph batch buckets: one compiled executable per
(batch, new-token, cache-len) bucket.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from recsys_examples_tpu.inference.kvcache import (
    KVCacheConfig,
    KVCacheState,
    allocate_kvcache,
    append_kvcache,
    gather_kvcache,
    lookup_kvcache,
)
from recsys_examples_tpu.modules.config import HSTUConfig


def delta_attention(
    q: jax.Array,        # [B, S, H, dh] new-token queries
    k: jax.Array,        # [B, N, H, dh] full keys (cached ++ new, padded)
    v: jax.Array,        # [B, N, H, dh]
    q_pos: jax.Array,    # [B, S] global position of each new token
    kv_len: jax.Array,   # [B] total valid keys
    num_targets: Optional[jax.Array],
    alpha: float,
    scaling_seqlen: int,
) -> jax.Array:
    """SiLU delta attention: new queries over the full sequence
    (semantics: pt_hstu_attention.py:199 `_get_delta_valid_attn_mask`)."""
    B, S, H, dh = q.shape
    N = k.shape[1]
    sc = jnp.einsum(
        "bshd,bnhd->bhsn", q, k, preferred_element_type=jnp.float32
    ) * alpha
    p = jax.nn.silu(sc) * (1.0 / scaling_seqlen)
    col = jnp.arange(N, dtype=jnp.int32)[None, None, :]     # [1,1,N]
    row = q_pos.astype(jnp.int32)[:, :, None]               # [B,S,1]
    valid = col == row
    if num_targets is not None:
        hist_end = (kv_len - num_targets).astype(jnp.int32)[:, None, None]
        rowc = jnp.minimum(row, hist_end)
        colc = jnp.minimum(jnp.broadcast_to(col, (B, S, N)), hist_end)
    else:
        rowc, colc = row, jnp.broadcast_to(col, (B, S, N))
    dist = rowc - colc
    valid = valid | (dist > 0)
    valid = valid & (col < kv_len[:, None, None])
    p = p * valid[:, None].astype(p.dtype)
    out = jnp.einsum(
        "bhsn,bnhd->bshd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


class PagedHSTUInferLayer(nn.Module):
    """One HSTU layer, inference path. Parameter names/shapes match the
    training `HSTULayer` so trained params load directly."""

    config: HSTUConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,            # [B, S, D] new tokens
        cached_k: Optional[jax.Array],   # [B, Nc, H, dh] (dense path)
        cached_v: Optional[jax.Array],
        cached_len: jax.Array,   # [B]
        new_lens: jax.Array,     # [B] valid new tokens
        num_targets: Optional[jax.Array],
        scaling_seqlen: int,
        paged: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
        attn_backend: str = "auto",
    ):
        cfg = self.config
        H, dh, D = cfg.num_attention_heads, cfg.kv_channels, cfg.hidden_size
        B, S, _ = x.shape
        normed = nn.LayerNorm(
            epsilon=cfg.layernorm_epsilon,
            use_bias=cfg.learnable_input_layernorm,
            use_scale=cfg.learnable_input_layernorm,
            dtype=cfg.dtype, name="input_layernorm",
        )(x)
        from recsys_examples_tpu.modules.hstu_layer import _dense, MODEL_AXIS

        # chunked uvqk projection: same param names/shapes as the training
        # HSTULayer ([D, 4, H*dh] kernel, contiguous chunk outputs)
        uvqk_kernel = self.param(
            "uvqk_kernel",
            nn.with_partitioning(
                nn.initializers.variance_scaling(
                    1.0, "fan_in", "truncated_normal",
                    in_axis=0, out_axis=(1, 2),
                ),
                (None, None, MODEL_AXIS),
            ),
            (D, 4, H * dh),
            jnp.float32,
        )
        if cfg.add_uvqk_bias:
            uvqk_bias = self.param(
                "uvqk_bias",
                nn.with_partitioning(
                    nn.initializers.zeros_init(), (None, MODEL_AXIS)
                ),
                (4, H * dh),
                jnp.float32,
            )
        chunks = []
        for c in range(4):
            w = uvqk_kernel[:, c, :].astype(cfg.dtype)
            y_c = jnp.dot(normed, w, preferred_element_type=cfg.dtype)
            if cfg.add_uvqk_bias:
                y_c = y_c + uvqk_bias[c].astype(cfg.dtype)
            chunks.append(nn.silu(y_c))
        u, v_new, q, k_new = chunks
        v_new = v_new.reshape(B, S, H, dh)
        q = q.reshape(B, S, H, dh)
        k_new = k_new.reshape(B, S, H, dh)

        if paged is not None:
            # paged path: read cached K/V straight from the page pool
            # (Pallas kernel on TPU; jnp twin elsewhere)
            from recsys_examples_tpu.ops.pallas.paged_hstu_attention import (
                paged_hstu_delta_attention,
            )

            k_pages, v_pages, page_table = paged
            attn = paged_hstu_delta_attention(
                q, k_pages, v_pages, page_table, cached_len,
                k_new, v_new, new_lens, num_targets,
                alpha=1.0 / (dh ** 0.5), scaling_seqlen=scaling_seqlen,
                backend=attn_backend,
            ).reshape(B, S, H * dh)
        else:
            # full K/V = cached ++ new (positions cached_len + i)
            Nc = cached_k.shape[1]
            N = Nc + S
            full_k = jnp.concatenate([cached_k, k_new], axis=1)
            full_v = jnp.concatenate([cached_v, v_new], axis=1)
            # move new tokens into their true positions: cached part is
            # already position-aligned [0, cached_len); new token i sits at
            # cached_len + i but is stored at Nc + i -> build index map
            pos = jnp.arange(N, dtype=jnp.int32)[None, :]
            # gather order: for position p < cached_len -> p;
            # for p in [cached_len, cached_len+new) -> Nc + (p - cached_len)
            cl = cached_len[:, None]
            src = jnp.where(pos < cl, pos, Nc + (pos - cl))
            src = jnp.clip(src, 0, N - 1)
            full_k = jnp.take_along_axis(
                full_k, src[:, :, None, None], axis=1
            )
            full_v = jnp.take_along_axis(
                full_v, src[:, :, None, None], axis=1
            )

            q_pos = (cached_len[:, None]
                     + jnp.arange(S, dtype=jnp.int32)[None, :])
            kv_len = cached_len + new_lens
            attn = delta_attention(
                q, full_k, full_v, q_pos, kv_len, num_targets,
                alpha=1.0 / (dh ** 0.5), scaling_seqlen=scaling_seqlen,
            ).reshape(B, S, H * dh)

        y = nn.LayerNorm(
            epsilon=cfg.layernorm_epsilon,
            use_bias=cfg.learnable_output_layernorm,
            use_scale=cfg.learnable_output_layernorm,
            dtype=cfg.dtype, name="output_layernorm",
        )(attn)
        y = y * u
        out = _dense(
            D, use_bias=False, kernel_axes=(MODEL_AXIS, None),
            name="linear_proj", dtype=cfg.dtype,
        )(y)
        if cfg.residual:
            out = out + x
        return out, k_new, v_new


class HSTUBlockInference(nn.Module):
    """Stack of PagedHSTUInferLayers; collects per-layer new K/V for the
    cache append (reference: modules/hstu_block_inference.py:15)."""

    config: HSTUConfig

    @nn.compact
    def __call__(
        self, x, cached_k, cached_v, cached_len, new_lens, num_targets,
        scaling_seqlen, paged=None, attn_backend="auto",
    ):
        cfg = self.config
        ks, vs = [], []
        for i in range(cfg.num_layers):
            layer_paged = None
            if paged is not None:
                k_pages, v_pages, page_table = paged
                layer_paged = (k_pages[i], v_pages[i], page_table)
            x, k_new, v_new = PagedHSTUInferLayer(
                cfg, name=f"layer_{i}"
            )(
                x,
                None if cached_k is None else cached_k[i],
                None if cached_v is None else cached_v[i],
                cached_len, new_lens, num_targets, scaling_seqlen,
                paged=layer_paged, attn_backend=attn_backend,
            )
            ks.append(k_new)
            vs.append(v_new)
        return x, jnp.stack(ks), jnp.stack(vs)


def strip_cached_tokens(
    values: jax.Array,      # [B, S_full, ...] dense per-user sequences
    lengths: jax.Array,     # [B] full lengths
    cached: jax.Array,      # [B] cached prefix lengths
    max_new: int,
):
    """Select the uncached suffix per user (reference:
    kjt_aux_op.cpp:349 `strip_cached_tokens`). Returns
    (new_values [B, max_new, ...], new_lens [B])."""
    B = values.shape[0]
    idx = cached[:, None] + jnp.arange(max_new, dtype=jnp.int32)[None, :]
    ok = idx < lengths[:, None]
    idx = jnp.clip(idx, 0, values.shape[1] - 1)
    out = jnp.take_along_axis(
        values, idx.reshape(B, max_new, *([1] * (values.ndim - 2))), axis=1
    )
    out = jnp.where(
        ok.reshape(B, max_new, *([1] * (values.ndim - 2))),
        out, jnp.zeros((), out.dtype),
    )
    return out, jnp.maximum(lengths - cached, 0).astype(jnp.int32)
