"""SID-GR eval metrics: recall@k / NDCG@k / hitrate over generated SID
tuples (reference: examples/sid_gr/modules/eval_metrics.py)."""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp


def sid_rank(
    paths: jax.Array,     # [B, W, H] beam-ordered generated SID tuples
    target: jax.Array,    # [B, H] true SID tuple
) -> jax.Array:
    """1-based rank of the exact target tuple among beams (0 = miss)."""
    match = jnp.all(paths == target[:, None, :], axis=-1)  # [B, W]
    any_match = jnp.any(match, axis=1)
    first = jnp.argmax(match, axis=1) + 1
    return jnp.where(any_match, first, 0).astype(jnp.int32)


def sid_eval_metrics(
    paths: jax.Array,
    target: jax.Array,
    ks: Sequence[int] = (1, 5, 10),
) -> Dict[str, jax.Array]:
    rank = sid_rank(paths, target)
    out = {}
    r = rank.astype(jnp.float32)
    hit = rank >= 1
    for k in ks:
        hk = (hit & (rank <= k)).astype(jnp.float32)
        out[f"recall@{k}"] = hk.mean()
        out[f"ndcg@{k}"] = jnp.where(
            hk > 0, 1.0 / jnp.log2(r + 1.0), 0.0
        ).mean()
    out["mrr"] = jnp.where(hit, 1.0 / jnp.maximum(r, 1.0), 0.0).mean()
    return out
