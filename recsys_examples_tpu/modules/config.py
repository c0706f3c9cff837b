"""Model/layer configuration dataclasses.

Mirrors the surface of the reference configs
(reference: examples/hstu/configs/hstu_config.py:88 `HSTUConfig`,
examples/hstu/configs/task_config.py) as plain dataclasses; the gin-style
text-config loader in utils/gin_config.py binds onto these.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import List, Optional, Tuple

import jax.numpy as jnp


class KernelBackend(enum.Enum):
    PALLAS = "pallas"   # Pallas TPU varlen kernel (production path)
    JNP = "jnp"         # dense-padded jnp reference (debug twin)


class HSTULayerType(enum.Enum):
    NATIVE = "native"   # flax layer, TP-shardable
    DEBUG = "debug"     # always-jnp reference twin


@dataclasses.dataclass(frozen=True)
class PositionEncodingConfig:
    num_position_buckets: int = 8192
    num_time_buckets: int = 2048
    use_time_encoding: bool = False


@dataclasses.dataclass(frozen=True)
class HSTUConfig:
    hidden_size: int = 1024
    num_layers: int = 8
    num_attention_heads: int = 4
    kv_channels: int = 256          # per-head attention/linear dim
    hidden_dropout: float = 0.0
    layernorm_epsilon: float = 1e-5
    is_causal: bool = True
    target_group_size: int = 1
    max_attn_len: int = 0
    # trainable T5-style relative attention bias fed to the kernel as rab
    # (reference: rab/has_drab of hstu_attn_varlen_func); dense [1,H,N,N],
    # so intended for moderate max_seqlen configs
    use_relative_attention_bias: bool = False
    relative_bias_num_buckets: int = 128
    relative_bias_max_distance: int = 1024
    learnable_input_layernorm: bool = True
    learnable_output_layernorm: bool = False
    residual: bool = True
    add_uvqk_bias: bool = True
    scaling_seqlen: int = -1
    kernel_backend: KernelBackend = KernelBackend.PALLAS
    hstu_layer_type: HSTULayerType = HSTULayerType.NATIVE
    position_encoding_config: Optional[PositionEncodingConfig] = None
    dtype: jnp.dtype = jnp.bfloat16
    # parallelism
    tensor_model_parallel_size: int = 1
    sequence_parallel: bool = False
    # preprocessing MLPs (project raw embedding dims up to hidden)
    item_embedding_dim: int = 0        # >0 enables item MLP
    contextual_embedding_dim: int = 0  # >0 enables contextual MLP
    disable_contextual_mask: bool = False
    recompute_layer: bool = False      # jax.checkpoint each HSTU layer
    attn_block_q: int = 128
    attn_block_k: int = 128
    # Run the HSTU layer stack in the attention kernel's block-aligned
    # jagged layout: one relayout per block instead of per layer; the
    # kernels zero their own unwritten tail rows.
    aligned_block: bool = True


@dataclasses.dataclass(frozen=True)
class EmbeddingConfig:
    """A static (data-parallel) embedding table.

    (reference: examples/hstu/utils/gin_config_args.py EmbeddingArgs)
    """
    feature_names: Tuple[str, ...]
    table_name: str
    vocab_size: int
    dim: int
    sharding_type: str = "data_parallel"  # or "model_parallel"


@dataclasses.dataclass(frozen=True)
class RankingConfig:
    embedding_configs: Tuple[EmbeddingConfig, ...]
    prediction_head_arch: Tuple[int, ...] = (512, 10)
    prediction_head_act_type: str = "relu"
    prediction_head_bias: bool = True
    num_tasks: int = 1
    eval_metrics: Tuple[str, ...] = ("AUC",)


@dataclasses.dataclass(frozen=True)
class RetrievalConfig:
    embedding_configs: Tuple[EmbeddingConfig, ...]
    temperature: float = 0.05
    l2_norm_eps: float = 1e-6
    num_negatives: int = -1  # -1 => all in-batch
    eval_metrics: Tuple[str, ...] = ("HR@10", "NDCG@10", "MRR")
