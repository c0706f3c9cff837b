"""End-to-end HSTU ranking inference with user-keyed KV cache.

Counterpart of the reference's `InferenceRankingGR.forward_with_kvcache`
(examples/hstu/model/inference_ranking_gr.py:130):
  kv lookup -> allocate -> (host onboard) -> strip cached tokens ->
  embedding lookup for new tokens -> dense fwd over cached+new KV ->
  append new KV -> candidate scores.

Works on padded dense per-user layout [B, S, ...]; bucketed shapes give one
compiled executable per bucket (CUDA-graph analogue).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from recsys_examples_tpu.dynamicemb.exportable_tables import (
    InferenceTableState,
    inference_lookup,
)
from recsys_examples_tpu.inference.hstu_inference import (
    HSTUBlockInference,
    strip_cached_tokens,
)
from recsys_examples_tpu.inference.kvcache import (
    KVCacheConfig,
    KVCacheState,
    allocate_kvcache,
    append_kvcache,
    gather_kvcache,
    lookup_kvcache,
)
from recsys_examples_tpu.modules.config import HSTUConfig
from recsys_examples_tpu.modules.mlp import MLP


class InferenceDenseModule(nn.Module):
    """HSTU inference block + prediction head; params line up with the
    training RankingGR dense tree (hstu_block/layer_i, head)."""

    config: HSTUConfig
    head_arch: Tuple[int, ...]

    @nn.compact
    def __call__(
        self, x, cached_k, cached_v, cached_len, new_lens, num_targets,
        scaling_seqlen, paged=None, attn_backend="auto",
    ):
        out, ks, vs = HSTUBlockInference(self.config, name="hstu_block")(
            x, cached_k, cached_v, cached_len, new_lens, num_targets,
            scaling_seqlen, paged=paged, attn_backend=attn_backend,
        )
        # L2 normalize (postprocessor parity) then head
        v32 = out.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(v32 * v32, axis=-1, keepdims=True) + 1e-12)
        logits = MLP(self.head_arch, dtype=self.config.dtype, name="head")(
            (v32 / norm).astype(self.config.dtype)
        )
        return logits.astype(jnp.float32), ks, vs


@dataclasses.dataclass
class InferenceRankingGR:
    """Stateful wrapper: dense params + frozen embedding tables + KV cache."""

    config: HSTUConfig
    kv_config: KVCacheConfig
    dense_params: dict
    item_table: InferenceTableState
    head_arch: Tuple[int, ...] = (512, 1)

    def __post_init__(self):
        self.module = InferenceDenseModule(self.config, self.head_arch)
        self.kv_state = None

    def init_cache(self):
        from recsys_examples_tpu.inference.kvcache import create_kvcache

        self.kv_state = create_kvcache(self.kv_config)

    def forward_with_kvcache(
        self,
        user_ids: jax.Array,    # [B] int64
        item_ids: jax.Array,    # [B, S_full] full sequences (hist+cand)
        lengths: jax.Array,     # [B]
        num_candidates: Optional[jax.Array],
        max_new: int,
        use_paged_kernel: Optional[bool] = None,
    ):
        """Returns (logits [B, max_new, num_tasks], new_lens [B]).

        use_paged_kernel=True reads cached K/V straight from the page pool
        in the attention kernel (no dense gather materialization); default
        auto-enables it on TPU.
        """
        if use_paged_kernel is None:
            use_paged_kernel = jax.default_backend() == "tpu"
        # the whole cache transition (lookup -> allocate -> strip -> dense
        # fwd -> append) runs as ONE jitted executable per (max_new,
        # has_candidates, paged) bucket — the CUDA-graph analogue; eager
        # per-op dispatch of the cache bookkeeping dominates otherwise
        key = (max_new, num_candidates is not None, use_paged_kernel,
               item_ids.shape)
        if not hasattr(self, "_steps"):
            self._steps = {}
        if key not in self._steps:
            # params and the frozen table ride as arguments — captured by
            # closure they would be baked into the HLO as multi-GB literals
            def step(kv_state, dense_params, item_table, user_ids,
                     item_ids, lengths, num_candidates):
                return self._forward_impl(
                    kv_state, dense_params, item_table, user_ids, item_ids,
                    lengths, num_candidates, max_new, use_paged_kernel,
                )
            self._steps[key] = jax.jit(step, donate_argnums=(0,))
        self.kv_state, logits, new_lens = self._steps[key](
            self.kv_state, self.dense_params, self.item_table,
            user_ids, item_ids, lengths, num_candidates
        )
        return logits, new_lens

    def _forward_impl(
        self, kv, dense_params, item_table, user_ids, item_ids, lengths,
        num_candidates, max_new, use_paged_kernel,
    ):
        cfg = self.kv_config
        slots, cached = lookup_kvcache(kv, user_ids)
        # only history can be cached; candidates always recompute
        hist_len = lengths - (
            num_candidates if num_candidates is not None else 0
        )
        cached = jnp.minimum(cached, hist_len)
        kv, slots = allocate_kvcache(kv, cfg, user_ids, hist_len)
        # strip cached prefix
        new_ids, new_lens = strip_cached_tokens(
            item_ids[..., None], lengths, cached, max_new
        )
        new_ids = new_ids[..., 0]
        emb = inference_lookup(
            item_table, new_ids.reshape(-1).astype(jnp.int64)
        ).reshape(new_ids.shape[0], max_new, -1)
        emb = emb.astype(self.config.dtype)
        scaling = (
            self.config.scaling_seqlen
            if self.config.scaling_seqlen > 0
            else cfg.max_cached_len
        )
        if use_paged_kernel:
            page_table = kv.user_pages[jnp.maximum(slots, 0)]
            page_table = jnp.where(
                slots[:, None] >= 0, page_table, -1
            )
            clen = jnp.minimum(
                jnp.where(slots >= 0, kv.user_len[jnp.maximum(slots, 0)], 0),
                cached,
            )
            logits, ks, vs = self.module.apply(
                {"params": dense_params},
                emb, None, None, clen, new_lens, num_candidates, scaling,
                paged=(kv.k_pages, kv.v_pages, page_table),
            )
        else:
            ck, cv, clen = gather_kvcache(kv, cfg, slots, cfg.max_cached_len)
            clen = jnp.minimum(clen, cached)
            logits, ks, vs = self.module.apply(
                {"params": dense_params},
                emb, ck, cv, clen, new_lens, num_candidates, scaling,
            )
        # append only the non-candidate new tokens to the cache
        keep = new_lens - (
            num_candidates if num_candidates is not None else 0
        )
        keep = jnp.maximum(keep, 0)
        kv = append_kvcache(kv, cfg, slots, ks, vs, keep)
        return kv, logits, new_lens
