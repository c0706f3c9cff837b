"""HSTU attention backend dispatch.

Mirrors the reference's `create_hstu_attention` factory
(examples/hstu/modules/hstu_attention.py:317) with two backends:
  - PALLAS: the Pallas TPU varlen kernel (ops/pallas/hstu_attention.py)
  - JNP:    dense-padded jnp reference (ops/hstu_attention_ref.py) — the
            correctness twin, also used on CPU test meshes.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from recsys_examples_tpu.modules.config import HSTUConfig, KernelBackend
from recsys_examples_tpu.ops.hstu_attention_ref import hstu_mha_reference
from recsys_examples_tpu.ops.pallas.hstu_attention import (
    hstu_attn_varlen,
    hstu_attn_varlen_rab,
)

AttentionFn = Callable[..., jax.Array]


def create_hstu_attention(config: HSTUConfig) -> AttentionFn:
    backend = config.kernel_backend

    def attn(
        q: jax.Array,           # [T, H_local, D]
        k: jax.Array,
        v: jax.Array,
        seq_offsets: jax.Array,
        max_seqlen: int,
        *,
        num_contextuals: Optional[jax.Array] = None,
        num_targets: Optional[jax.Array] = None,
        scaling_seqlen: int = -1,
        rab: Optional[jax.Array] = None,  # [B|1, H|1, N, N]
        input_aligned: bool = False,
        packed_total: int = 0,
    ) -> jax.Array:
        alpha = 1.0 / (config.kv_channels ** 0.5)
        if backend == KernelBackend.PALLAS:
            if rab is not None:
                assert not input_aligned, "rab path expects packed layout"
                return hstu_attn_varlen_rab(
                    q, k, v, rab,
                    (seq_offsets, num_contextuals, num_targets),
                    max_seqlen=max_seqlen,
                    alpha=alpha,
                    scaling_seqlen=scaling_seqlen,
                    causal=config.is_causal,
                    target_group_size=config.target_group_size,
                    max_attn_len=config.max_attn_len,
                    block_q=config.attn_block_q,
                    block_k=config.attn_block_k,
                )
            return hstu_attn_varlen(
                q, k, v,
                (seq_offsets, num_contextuals, num_targets),
                max_seqlen=max_seqlen,
                alpha=alpha,
                scaling_seqlen=scaling_seqlen,
                causal=config.is_causal,
                target_group_size=config.target_group_size,
                max_attn_len=config.max_attn_len,
                block_q=config.attn_block_q,
                block_k=config.attn_block_k,
                input_aligned=input_aligned,
                packed_total=packed_total,
            )
        assert not input_aligned, "aligned layout is PALLAS-only"
        out = hstu_mha_reference(
            max_seqlen, alpha, q, k, v, seq_offsets,
            causal=config.is_causal,
            num_targets=num_targets,
            num_contextuals=num_contextuals,
            max_attn_len=config.max_attn_len,
            target_group_size=config.target_group_size,
            scaling_seqlen=scaling_seqlen,
            rab=rab,
        )
        return out.astype(v.dtype)

    return attn
