"""HSTU layer: LN -> uvqk projection -> SiLU -> attention -> LN*u*dropout
-> output projection -> residual.

TPU-native re-design of the reference layer (examples/hstu/modules/
native_hstu_layer.py:41 `HSTULayer`). Tensor parallelism is expressed with
parameter partitioning metadata (`nn.with_partitioning` on the "model" mesh
axis) + XLA GSPMD instead of explicit Megatron Column/RowParallelLinear
collectives: the uvqk kernel is column-sharded per head-group, the output
projection row-sharded, and XLA inserts the all-reduce.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from recsys_examples_tpu.jagged.jagged_tensor import JaggedData
from recsys_examples_tpu.modules.config import HSTUConfig
from recsys_examples_tpu.modules.hstu_attention import create_hstu_attention

# mesh axis used for tensor parallelism
MODEL_AXIS = "model"


def _dense(features, *, use_bias, kernel_axes, name, dtype):
    kernel_init = nn.with_partitioning(
        nn.initializers.lecun_normal(), kernel_axes
    )
    bias_axes = (kernel_axes[1],)
    return nn.Dense(
        features,
        use_bias=use_bias,
        dtype=dtype,
        kernel_init=kernel_init,
        bias_init=nn.with_partitioning(nn.initializers.zeros_init(), bias_axes)
        if use_bias
        else nn.initializers.zeros_init(),
        name=name,
    )


class HSTULayer(nn.Module):
    """One HSTU block unit. Input/output: JaggedData with values [T, D]."""

    config: HSTUConfig

    @nn.compact
    def __call__(self, jd: JaggedData, train: bool = True) -> JaggedData:
        cfg = self.config
        H = cfg.num_attention_heads
        dh = cfg.kv_channels
        D = cfg.hidden_size
        x = jd.values  # [T, D]

        # ---- sequence parallelism (Megatron-SP semantics via GSPMD;
        # reference: native_hstu_layer.py:85-99). Constrain the token dim
        # of the residual stream to the "model" axis: layernorms and
        # elementwise ops then run sequence-sharded, XLA inserts the
        # all-gather feeding the column-parallel uvqk GEMM and the
        # reduce-scatter after the row-parallel output projection.
        if cfg.sequence_parallel and cfg.tensor_model_parallel_size > 1:
            from jax.sharding import PartitionSpec as P

            x = jax.lax.with_sharding_constraint(x, P(MODEL_AXIS, None))

        # ---- input layernorm (fp32 stats)
        normed = nn.LayerNorm(
            epsilon=cfg.layernorm_epsilon,
            use_bias=cfg.learnable_input_layernorm,
            use_scale=cfg.learnable_input_layernorm,
            dtype=cfg.dtype,
            name="input_layernorm",
        )(x)

        # ---- fused uvqk projection, one GEMM per chunk. The kernel is
        # [D, 4, H*dh] (chunk axis = u/v/q/k; heads on the last axis so TP
        # shards heads); each chunk's GEMM writes a CONTIGUOUS [T, H*dh]
        # output — the reference's per-head-interleaved column layout
        # (native_hstu_layer.py:155-197) would force strided slice copies
        # of every u/v/q/k on TPU (~4 relayout passes per layer).
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
        u, v, q, k = chunks
        v = v.reshape(-1, H, dh)
        q = q.reshape(-1, H, dh)
        k = k.reshape(-1, H, dh)

        # ---- jagged SiLU attention (optional trainable relative bias)
        rab = None
        if cfg.use_relative_attention_bias:
            from recsys_examples_tpu.modules.position_encoder import (
                RelativeAttentionBias,
            )

            rab = RelativeAttentionBias(
                num_heads=H,
                num_buckets=cfg.relative_bias_num_buckets,
                max_distance=cfg.relative_bias_max_distance,
                causal=cfg.is_causal,
                name="relative_bias",
            )(jd.max_seqlen)
        attn_fn = create_hstu_attention(cfg)
        attn_out = attn_fn(
            q, k, v,
            jd.seqlen_offsets,
            jd.max_seqlen,
            num_contextuals=None
            if cfg.disable_contextual_mask
            else jd.contextual_seqlen,
            num_targets=jd.num_candidates,
            scaling_seqlen=jd.scaling_seqlen
            if jd.scaling_seqlen > 0
            else jd.max_seqlen,
            rab=rab,
            input_aligned=jd.values_aligned,
            packed_total=jd.packed_total,
        )  # [T, H, dh]
        attn_out = attn_out.reshape(-1, H * dh)

        # ---- output layernorm * u, dropout
        y = nn.LayerNorm(
            epsilon=cfg.layernorm_epsilon,
            use_bias=cfg.learnable_output_layernorm,
            use_scale=cfg.learnable_output_layernorm,
            dtype=cfg.dtype,
            name="output_layernorm",
        )(attn_out)
        y = y * u
        if cfg.hidden_dropout > 0.0:
            y = nn.Dropout(rate=cfg.hidden_dropout, deterministic=not train)(y)

        # ---- output projection (+ residual)
        out = _dense(
            D,
            use_bias=False,
            kernel_axes=(MODEL_AXIS, None),
            name="linear_proj",
            dtype=cfg.dtype,
        )(y)
        if cfg.sequence_parallel and cfg.tensor_model_parallel_size > 1:
            from jax.sharding import PartitionSpec as P

            # reduce-scatter the row-parallel partial sums straight into
            # the sequence-sharded layout (instead of all-reduce)
            out = jax.lax.with_sharding_constraint(out, P(MODEL_AXIS, None))
        if cfg.residual:
            out = out + x
        return jd.replace(values=out)
