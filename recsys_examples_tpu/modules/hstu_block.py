"""HSTU block: preprocessor -> N x HSTULayer -> postprocessor.

TPU-native re-design of the reference pipeline
(examples/hstu/modules/hstu_block.py:18, hstu_processor.py:46
`hstu_preprocess_embeddings`, :250 `HSTUBlockPreprocessor`,
:379 `HSTUBlockPostprocessor`).

All jagged manipulation is static-shape gather/scatter (ops/jagged.py);
capacities are computed from the batch's static feature capacities.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from recsys_examples_tpu.data.hstu_batch import HSTUBatch
from recsys_examples_tpu.jagged.jagged_tensor import JaggedData
from recsys_examples_tpu.modules.config import HSTUConfig
from recsys_examples_tpu.modules.hstu_layer import HSTULayer
from recsys_examples_tpu.modules.mlp import MLP
from recsys_examples_tpu.modules.position_encoder import HSTUPositionalEncoder
from recsys_examples_tpu.ops.jagged import (
    concat_2D_jagged,
    concat_multi_2D_jagged,
    interleave_jagged,
    lengths_to_offsets,
    split_2D_jagged,
)


class HSTUBlockPreprocessor(nn.Module):
    """Interleave item/action, concat contextual, position-encode, dropout."""

    config: HSTUConfig

    @nn.compact
    def __call__(
        self,
        embeddings: Dict[str, jax.Array],  # feature -> [cap, D] jagged values
        batch: HSTUBatch,
        train: bool = True,
    ) -> JaggedData:
        cfg = self.config
        item = batch.features[batch.item_feature_name]
        seq_values = embeddings[batch.item_feature_name].astype(cfg.dtype)
        seq_lengths = item.lengths
        seq_max = batch.feature_to_max_seqlen[batch.item_feature_name]

        has_action = batch.action_feature_name is not None
        if has_action:
            # Interleave item/action for the HISTORY part only — candidate
            # items enter WITHOUT their actions (the action is what the
            # model predicts; feeding it would leak the label). Reference:
            # hstu_processor.py:59-68 "the embeddings of candidates need
            # no interleaving".
            action_values = embeddings[batch.action_feature_name].astype(cfg.dtype)
            if batch.num_candidates is not None and batch.max_num_candidates:
                offs = lengths_to_offsets(seq_lengths)
                nc = batch.num_candidates
                hist_len = seq_lengths - nc
                cand_cap = len(seq_lengths) * batch.max_num_candidates
                T = seq_values.shape[0]
                hv, ho, cv, co = split_2D_jagged(
                    seq_values, offs, hist_len,
                    total_a=T, total_b=cand_cap,
                )
                av, _, _, _ = split_2D_jagged(
                    action_values, offs, hist_len,
                    total_a=T, total_b=cand_cap,
                )
                inter = interleave_jagged(hv, av)   # [2T, D]
                io = ho * 2
                seq_values, new_offs = concat_2D_jagged(inter, io, cv, co)
                seq_lengths = 2 * hist_len + nc
                seq_max = seq_max * 2  # bound: 2*hist + cand <= 2*item_max
            else:
                seq_values = interleave_jagged(seq_values, action_values)
                seq_lengths = seq_lengths * 2
                seq_max = seq_max * 2
        if cfg.item_embedding_dim > 0:
            seq_values = MLP(
                (cfg.hidden_size, cfg.hidden_size),
                activation="relu",
                dtype=cfg.dtype,
                name="item_mlp",
            )(seq_values)
        seq_offsets = lengths_to_offsets(seq_lengths)

        # candidates are never interleaved, so their counts are unchanged
        # by the action interleave
        num_candidates = batch.num_candidates
        max_num_candidates = batch.max_num_candidates

        contextual_max = 0
        contextual_lengths = None
        if batch.contextual_feature_names:
            ctx_vals = [
                embeddings[n].astype(cfg.dtype)
                for n in batch.contextual_feature_names
            ]
            ctx_offs = [
                batch.features[n].offsets for n in batch.contextual_feature_names
            ]
            cv, co = concat_multi_2D_jagged(ctx_vals, ctx_offs)
            if cfg.contextual_embedding_dim > 0:
                cv = MLP(
                    (cfg.hidden_size, cfg.hidden_size),
                    activation="relu",
                    dtype=cfg.dtype,
                    name="contextual_mlp",
                )(cv)
            contextual_max = sum(
                batch.feature_to_max_seqlen[n]
                for n in batch.contextual_feature_names
            )
            contextual_lengths = (co[1:] - co[:-1]).astype(jnp.int32)
            seq_values, seq_offsets = concat_2D_jagged(cv, co, seq_values, seq_offsets)
            seq_lengths = (seq_offsets[1:] - seq_offsets[:-1]).astype(jnp.int32)
            seq_max = seq_max + contextual_max

        jd = JaggedData(
            values=seq_values,
            seqlen=seq_lengths.astype(jnp.int32),
            seqlen_offsets=seq_offsets.astype(jnp.int32),
            max_seqlen=seq_max,
            max_num_candidates=max_num_candidates,
            num_candidates=num_candidates,
            num_candidates_offsets=None
            if num_candidates is None
            else lengths_to_offsets(num_candidates),
            contextual_max_seqlen=contextual_max,
            contextual_seqlen=contextual_lengths,
            contextual_seqlen_offsets=None
            if contextual_lengths is None
            else lengths_to_offsets(contextual_lengths),
            has_interleaved_action=has_action,
            scaling_seqlen=cfg.scaling_seqlen,
        )

        if cfg.position_encoding_config is not None:
            pec = cfg.position_encoding_config
            vals = HSTUPositionalEncoder(
                num_position_buckets=pec.num_position_buckets,
                num_time_buckets=pec.num_time_buckets,
                embedding_dim=cfg.hidden_size,
                use_time_encoding=pec.use_time_encoding,
                name="positional_encoder",
            )(
                seq_embeddings=jd.values,
                seq_lengths=jd.seqlen,
                seq_offsets=jd.seqlen_offsets,
                num_targets=jd.num_candidates,
                seq_timestamps=batch.timestamps,
                max_seqlen=jd.max_seqlen,
            )
            jd = jd.replace(values=vals)
        if cfg.hidden_dropout > 0.0:
            jd = jd.replace(
                values=nn.Dropout(
                    rate=cfg.hidden_dropout, deterministic=not train
                )(jd.values)
            )
        return jd


class HSTUBlockPostprocessor(nn.Module):
    """Select candidate (or post-contextual) embeddings, de-interleave,
    L2-normalize (reference: hstu_processor.py:379)."""

    l2_norm_eps: float = 1e-6

    @nn.compact
    def __call__(self, jd: JaggedData) -> JaggedData:
        values = jd.values
        T = values.shape[0]
        if jd.max_num_candidates > 0:
            cand_cap = jd.seqlen.shape[0] * jd.max_num_candidates
            len_a = jd.seqlen - jd.num_candidates
            _, _, values, offsets = split_2D_jagged(
                values, jd.seqlen_offsets, len_a,
                total_a=T, total_b=cand_cap,
            )
            max_seqlen = jd.max_num_candidates
        elif jd.contextual_max_seqlen > 0:
            len_a = jd.contextual_seqlen
            ctx_cap = jd.seqlen.shape[0] * jd.contextual_max_seqlen
            _, _, values, offsets = split_2D_jagged(
                values, jd.seqlen_offsets, len_a,
                total_a=ctx_cap,
                total_b=T - ctx_cap,
            )
            max_seqlen = jd.max_seqlen - jd.contextual_max_seqlen
        else:
            offsets = jd.seqlen_offsets
            max_seqlen = jd.max_seqlen

        if jd.has_interleaved_action and jd.max_num_candidates == 0:
            # no candidates: outputs are the interleaved full sequence —
            # keep the item rows. (With candidates, the selected candidate
            # rows were never interleaved; nothing to strip.)
            values = values.reshape(values.shape[0] // 2, 2, -1)[:, 0, :]
            offsets = offsets // 2
            max_seqlen = max_seqlen // 2

        # smooth L2 norm: sqrt(sum + eps^2) keeps the gradient finite on
        # all-zero padding rows (d||x||/dx at 0 is NaN otherwise)
        v32 = values.astype(jnp.float32)
        norm = jnp.sqrt(
            jnp.sum(v32 * v32, axis=-1, keepdims=True) + self.l2_norm_eps ** 2
        )
        values = (v32 / norm).astype(values.dtype)

        seqlen = (offsets[1:] - offsets[:-1]).astype(jnp.int32)
        return JaggedData(
            values=values,
            seqlen=seqlen,
            seqlen_offsets=offsets.astype(jnp.int32),
            max_seqlen=max_seqlen,
            scaling_seqlen=jd.scaling_seqlen,
        )


class HSTUBlock(nn.Module):
    """Preprocessor -> num_layers x HSTULayer -> postprocessor
    (reference: examples/hstu/modules/hstu_block.py:18)."""

    config: HSTUConfig

    @nn.compact
    def __call__(
        self,
        embeddings: Dict[str, jax.Array],
        batch: HSTUBatch,
        train: bool = True,
    ) -> JaggedData:
        cfg = self.config
        jd = HSTUBlockPreprocessor(cfg, name="preprocessor")(
            embeddings, batch, train
        )
        # Run the layer stack in the attention kernel's block-aligned
        # jagged layout: ONE relayout here and one back after the stack,
        # instead of 3 gathers + 1 scatter per layer around each kernel
        # call (plus their backward mirrors). Row overhead is <= 31 rows
        # per sequence (ops/pallas/hstu_attention.ATTN_ALIGN).
        from recsys_examples_tpu.modules.config import KernelBackend
        from recsys_examples_tpu.ops.pallas.hstu_attention import (
            attn_alignment,
        )

        use_aligned = (
            cfg.aligned_block
            and cfg.kernel_backend == KernelBackend.PALLAS
            and not cfg.use_relative_attention_bias
        )
        if use_aligned:
            T = jd.values.shape[0]
            lay = attn_alignment(
                jd.seqlen_offsets, T, cfg.attn_block_q, cfg.attn_block_k
            )
            jd = jd.replace(
                values=lay.to_aligned_d(jd.values),
                values_aligned=True,
                packed_total=T,
            )
        layer_cls = HSTULayer
        if cfg.recompute_layer:
            layer_cls = nn.checkpoint(HSTULayer, static_argnums=(2,))
        for i in range(cfg.num_layers):
            jd = layer_cls(cfg, name=f"layer_{i}")(jd, train)
        if use_aligned:
            jd = jd.replace(
                values=lay.to_packed_d(jd.values),
                values_aligned=False,
                packed_total=0,
            )
        return HSTUBlockPostprocessor(name="postprocessor")(jd)
