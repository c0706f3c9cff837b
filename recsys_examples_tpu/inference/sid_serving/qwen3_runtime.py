"""Qwen3-backed SID beam generation runtime.

Counterpart of the reference's gr_runtime decode loop
(examples/sid-gr-inference/src/gr_inference/gr_runtime/
{batched_beam_search.py:237, decode_loop.py, generation.py}): prefill the
context once, then `num_steps` beam steps through the fused beam-decode
attention; beam KV is never reordered — ancestry indices resolve paths
(gr_runtime/batched_topk_indices.py semantics). Optional per-step logits
masks plug in item constraints (gr_runtime/item_constraints.py ->
inference/sid_serving/item_constraints.py here).
"""
from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp

from recsys_examples_tpu.models.beam_search import (
    decode_paths,
    first_expand,
    init_beam,
    propagate,
)
from recsys_examples_tpu.models.qwen3 import Qwen3Model


def qwen3_generate_beam(
    model: Qwen3Model,
    params: dict,
    tokens: jax.Array,      # [B, N] int32 context (history SID stream)
    lengths: jax.Array,     # [B]
    num_steps: int,
    beam_width: int,
    logits_mask_fn: Optional[Callable[[int, jax.Array], jax.Array]] = None,
    logits_processor=None,
    backend: str = "auto",
) -> Tuple[jax.Array, jax.Array]:
    """Returns (paths [B, W, num_steps], scores [B, W]).

    logits_mask_fn(step, paths_so_far [B, W, step]) -> additive mask
    [B, W, V] (0 = allowed, -inf = banned) for constrained decoding.
    logits_processor: optional LogitsProcessor/chain
    (inference/sid_serving/logits_processor.py) applied AFTER the mask —
    the reference gr_runtime pipeline order (constraints are part of the
    chain there; here the mask arg is kept for the constraint fast path).
    """
    cfg = model.config
    B = tokens.shape[0]
    W = beam_width
    L = cfg.num_layers
    Hkv, dh = cfg.num_kv_heads, cfg.head_dim

    last_logits, ctx_kv = model.apply(
        params, tokens, lengths, method=Qwen3Model.prefill
    )
    logp0 = jax.nn.log_softmax(last_logits.astype(jnp.float32), axis=-1)
    state = init_beam(B, W, num_steps)
    if logits_mask_fn is not None:
        logp0 = logp0 + logits_mask_fn(
            0, jnp.zeros((B, W, 0), jnp.int32)
        )[:, 0]
    if logits_processor is not None:
        # one implicit beam at prefill (same contract as
        # SIDGRModel.beam_prefill)
        logp0 = logits_processor(
            0, logp0[:, None, :], jnp.zeros((B, 1, 0), jnp.int32)
        )[:, 0]
    state = first_expand(state, logp0)

    beam_k = [
        jnp.zeros((B, num_steps - 1, W, Hkv, dh), cfg.dtype)
        for _ in range(L)
    ]
    beam_v = [
        jnp.zeros((B, num_steps - 1, W, Hkv, dh), cfg.dtype)
        for _ in range(L)
    ]
    A = jnp.zeros((B, max(num_steps - 1, 1), W), jnp.int32)

    for h in range(1, num_steps):
        par = state.parents[:, h - 1, :]
        if h > 1:
            reroot = jnp.take_along_axis(
                A[:, : h - 1], par[:, None, :], axis=2
            )
            A = A.at[:, : h - 1].set(reroot)
        tok = state.tokens[:, h - 1, :]                      # [B, W]
        pos = (lengths[:, None] + jnp.int32(h - 1))
        pos = jnp.broadcast_to(pos, (B, W))
        logits, new_kv = model.apply(
            params, tok, pos, ctx_kv, lengths,
            [(beam_k[li][:, : h - 1], beam_v[li][:, : h - 1])
             for li in range(L)] if h > 1 else None,
            A[:, : h - 1] if h > 1 else None,
            backend,
            method=Qwen3Model.decode_step,
        )
        for li in range(L):
            beam_k[li] = beam_k[li].at[:, h - 1].set(new_kv[li][0])
            beam_v[li] = beam_v[li].at[:, h - 1].set(new_kv[li][1])
        A = A.at[:, h - 1].set(
            jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None], (B, W))
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if logits_mask_fn is not None or logits_processor is not None:
            paths_so_far = decode_paths(state)[:, :, :h]
            if logits_mask_fn is not None:
                logp = logp + logits_mask_fn(h, paths_so_far)
            if logits_processor is not None:
                logp = logits_processor(h, logp, paths_so_far)
        state = propagate(state, logp)
    return decode_paths(state), state.scores


def qwen3_generate_reference(
    model: Qwen3Model,
    params: dict,
    tokens: jax.Array,
    lengths: jax.Array,
    num_steps: int,
    beam_width: int,
) -> Tuple[jax.Array, jax.Array]:
    """No-KV baseline: re-runs the full prefix every step (reference twin
    of SIDGRModel.generate / gpt_model.py:681) — for testing the KV path."""
    cfg = model.config
    B, N = tokens.shape
    W = beam_width
    last_logits, _ = model.apply(
        params, tokens, lengths, method=Qwen3Model.prefill
    )
    logp0 = jax.nn.log_softmax(last_logits.astype(jnp.float32), axis=-1)
    state = init_beam(B, W, num_steps)
    state = first_expand(state, logp0)
    for h in range(1, num_steps):
        paths = decode_paths(state)                          # [B, W, steps]
        ext = jnp.concatenate(
            [jnp.repeat(tokens, W, axis=0),
             jnp.zeros((B * W, num_steps), jnp.int32)], axis=1
        )
        lens_bw = jnp.repeat(lengths, W)
        bw = jnp.arange(B * W)
        for hh in range(h):
            ext = ext.at[bw, lens_bw + hh].set(
                paths[:, :, hh].reshape(B * W)
            )
        logits, _ = model.apply(
            params, ext, lens_bw + h, method=Qwen3Model.prefill
        )
        logp = jax.nn.log_softmax(
            logits.astype(jnp.float32), axis=-1
        ).reshape(B, W, cfg.vocab_size)
        state = propagate(state, logp)
    return decode_paths(state), state.scores
