"""Loss modules: multi-task BCE/CE and sampled softmax.

References: examples/hstu/modules/multi_task_loss_module.py (bit-encoded
multi-task labels), examples/hstu/modules/sampled_softmax_loss.py:58,
examples/hstu/modules/negatives_sampler.py:59 (in-batch negatives).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def decode_bits(encoded: jax.Array, bit_width: int) -> jax.Array:
    """int labels [N] -> [N, bit_width] of 0/1 (LSB = task 0)."""
    bits = jnp.arange(bit_width, dtype=encoded.dtype)
    return (encoded[:, None] >> bits[None, :]) & 1


def multi_task_bce_loss(
    logits: jax.Array,      # [N, num_tasks] float
    labels: jax.Array,      # [N] int (bit-encoded)
    valid: jax.Array,       # [N] bool
    num_tasks: int,
) -> Tuple[jax.Array, jax.Array]:
    """Per-element BCE-with-logits; returns (sum_loss [num_tasks], count)."""
    y = decode_bits(labels, num_tasks).astype(jnp.float32)
    x = logits.astype(jnp.float32)
    # numerically stable bce-with-logits
    per = jnp.maximum(x, 0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
    per = per * valid[:, None].astype(jnp.float32)
    return per.sum(axis=0), valid.sum().astype(jnp.float32)


def cross_entropy_loss(
    logits: jax.Array,      # [N, num_classes]
    labels: jax.Array,      # [N] int class ids
    valid: jax.Array,       # [N] bool
) -> Tuple[jax.Array, jax.Array]:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=1)
    nll = nll[:, 0] * valid.astype(jnp.float32)
    return nll.sum(), valid.sum().astype(jnp.float32)


def in_batch_sampled_softmax_loss(
    query_emb: jax.Array,     # [N, D] L2-normalized user states
    target_emb: jax.Array,    # [N, D] L2-normalized supervision item embs
    target_ids: jax.Array,    # [N] int64 item ids (for dedup masking)
    valid: jax.Array,         # [N] bool
    temperature: float = 0.05,
) -> Tuple[jax.Array, jax.Array]:
    """Sampled-softmax with in-batch negatives.

    Every valid row's target serves as a negative for every other row;
    collisions (same item id) are masked out of the negatives, matching the
    reference `InBatchNegativesSampler` + `SampledSoftmaxLoss` semantics.
    """
    logits = (
        jnp.einsum(
            "nd,md->nm", query_emb.astype(jnp.float32),
            target_emb.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        / temperature
    )
    same_item = target_ids[:, None] == target_ids[None, :]
    eye = jnp.eye(logits.shape[0], dtype=bool)
    # negatives: valid columns, not the positive, not an id collision
    neg_ok = valid[None, :] & ~same_item
    allowed = neg_ok | eye
    logits = jnp.where(allowed, logits, -1e9)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.diagonal(logp)
    nll = nll * valid.astype(jnp.float32)
    return nll.sum(), valid.sum().astype(jnp.float32)
