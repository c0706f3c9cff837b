"""Item-catalog constraints for SID beam decode.

Counterpart of the reference's constrained decoding
(examples/sid-gr-inference/src/gr_inference/gr_runtime/item_constraints.py:
tries / masks / constrained topK / catalog reload).

The catalog of valid SID tuples becomes a dense array trie:
  children[node, token] -> child node id (-1 = invalid prefix).
Each live beam carries its trie node id; the per-step logits mask is a
single gather. `reload` rebuilds the arrays from a new catalog (online
catalog updates).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class TrieConstraint:
    def __init__(self, catalog: np.ndarray, codebook_size: int):
        """catalog: [num_items, H] valid SID tuples."""
        self.codebook_size = codebook_size
        self.num_hierarchies = catalog.shape[1]
        self.reload(catalog)

    def reload(self, catalog: np.ndarray) -> None:
        H = catalog.shape[1]
        C = self.codebook_size
        # build trie level by level
        children_list = []
        # node ids at current level: start with the single root (id 0)
        prefix_ids = np.zeros(len(catalog), np.int64)
        num_nodes = 1
        for h in range(H):
            tok = catalog[:, h].astype(np.int64)
            pair = prefix_ids * C + tok
            uniq, inv = np.unique(pair, return_inverse=True)
            ch = np.full((num_nodes, C), -1, np.int32)
            ch[uniq // C, uniq % C] = np.arange(len(uniq), dtype=np.int32)
            children_list.append(ch)
            prefix_ids = inv.astype(np.int64)
            num_nodes = len(uniq)
        self.children = [jnp.asarray(c) for c in children_list]
        self.num_items = len(catalog)

    def mask_logits(
        self, logits: jax.Array, node_ids: jax.Array, hierarchy: int
    ) -> jax.Array:
        """[B, W, C] logits + [B, W] trie nodes -> masked logits
        (invalid continuations to -inf)."""
        ch = self.children[hierarchy]
        allowed = ch[jnp.clip(node_ids, 0, ch.shape[0] - 1)] >= 0
        allowed = allowed & (node_ids >= 0)[..., None]
        return jnp.where(allowed, logits, -jnp.inf)

    def advance(
        self, node_ids: jax.Array, tokens: jax.Array, hierarchy: int
    ) -> jax.Array:
        """[B, W] nodes + chosen tokens -> child node ids."""
        ch = self.children[hierarchy]
        nxt = ch[jnp.clip(node_ids, 0, ch.shape[0] - 1), tokens]
        return jnp.where(node_ids >= 0, nxt, -1)


class LogitsProcessor:
    """Composable logits transforms (reference: gr_runtime logits
    processors): temperature + optional top-k truncation before beam
    expansion."""

    def __init__(self, temperature: float = 1.0, top_k: int = 0):
        self.temperature = temperature
        self.top_k = top_k

    def __call__(self, logits: jax.Array) -> jax.Array:
        if self.temperature != 1.0:
            logits = logits / self.temperature
        if self.top_k > 0 and self.top_k < logits.shape[-1]:
            kth = jax.lax.top_k(logits, self.top_k)[0][..., -1:]
            logits = jnp.where(logits >= kth, logits, -jnp.inf)
        return logits
