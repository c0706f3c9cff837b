"""Fixed-width constrained beam search over hierarchical SIDs.

Counterpart of the reference (examples/sid_gr/beam_search/beam_search.py:7
`BeamSearch`: propagate:63, build_beam_topk_indices:161, get_log_probs:246).

State is a pytree of fixed-shape arrays, so the whole H-step decode loop
jits (lax.scan-able).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class BeamState(NamedTuple):
    scores: jax.Array    # [B, W] accumulated log-probs
    tokens: jax.Array    # [B, H, W] chosen token per hierarchy
    parents: jax.Array   # [B, H, W] parent beam index per hierarchy
    step: jax.Array      # [] int32 current hierarchy


def init_beam(batch: int, beam_width: int, num_hierarchies: int) -> BeamState:
    scores = jnp.full((batch, beam_width), -jnp.inf, jnp.float32)
    scores = scores.at[:, 0].set(0.0)  # only beam 0 is live pre-expansion
    return BeamState(
        scores=scores,
        tokens=jnp.zeros((batch, num_hierarchies, beam_width), jnp.int32),
        parents=jnp.zeros((batch, num_hierarchies, beam_width), jnp.int32),
        step=jnp.zeros((), jnp.int32),
    )


def propagate(
    state: BeamState,
    log_probs: jax.Array,   # [B, W, C] per-beam next-token log-probs
) -> BeamState:
    """Accumulate scores, take global top-W over (beam, token)
    (reference: beam_search.py:63)."""
    B, W, C = log_probs.shape
    total = state.scores[:, :, None] + log_probs  # [B, W, C]
    flat = total.reshape(B, W * C)
    top_scores, top_idx = jax.lax.top_k(flat, W)
    parent = (top_idx // C).astype(jnp.int32)
    token = (top_idx % C).astype(jnp.int32)
    h = state.step
    tokens = state.tokens.at[:, h, :].set(token)
    parents = state.parents.at[:, h, :].set(parent)
    return BeamState(
        scores=top_scores, tokens=tokens, parents=parents, step=h + 1
    )


def first_expand(state: BeamState, log_probs0: jax.Array) -> BeamState:
    """Hierarchy-0 expansion from the single BOS context: top-W tokens
    (parents all 0)."""
    B, C = log_probs0.shape
    W = state.scores.shape[1]
    top_scores, top_idx = jax.lax.top_k(log_probs0, W)
    tokens = state.tokens.at[:, 0, :].set(top_idx.astype(jnp.int32))
    parents = state.parents.at[:, 0, :].set(0)
    return BeamState(
        scores=top_scores, tokens=tokens, parents=parents,
        step=state.step + 1,
    )


def gather_beams(x: jax.Array, parents: jax.Array) -> jax.Array:
    """Reorder per-beam data [B, W, ...] by parent indices [B, W]."""
    return jnp.take_along_axis(
        x, parents.reshape(parents.shape + (1,) * (x.ndim - 2)), axis=1
    )


def build_ancestry(state: BeamState) -> jax.Array:
    """[B, H, W] for each final beam w and hierarchy h, the beam index that
    produced the token at h on w's path (reference:
    build_beam_topk_indices beam_search.py:161). Walks parents backwards."""
    B, Hh, W = state.tokens.shape
    h_last = state.step - 1

    def walk(carry, h):
        # carry: current beam index per final beam [B, W]
        cur = carry
        take = jnp.take_along_axis(state.parents[:, h, :], cur, axis=1)
        use = h <= h_last
        new = jnp.where(use, take, cur)
        return new, cur

    idx0 = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None], (B, W))
    _, trace = jax.lax.scan(
        walk, idx0, jnp.arange(Hh - 1, -1, -1, dtype=jnp.int32)
    )
    # trace[h'] corresponds to hierarchy Hh-1-h'
    return jnp.flip(trace, axis=0).transpose(1, 0, 2)  # [B, H, W]


def decode_paths(state: BeamState) -> jax.Array:
    """[B, W, H] final token tuples per beam, resolved through ancestry."""
    anc = build_ancestry(state)  # [B, H, W]
    toks = jnp.take_along_axis(state.tokens, anc, axis=2)  # [B, H, W]
    return toks.transpose(0, 2, 1)
