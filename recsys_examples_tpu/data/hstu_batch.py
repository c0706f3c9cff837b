"""Batch containers + synthetic (Zipf) generator for HSTU training.

TPU-native counterpart of the reference's KJT-based `HSTUBatch`
(examples/commons/datasets/hstu_batch.py:214, random generator :376).
Features are static-capacity jagged id lists; every array is a pytree leaf
so the whole batch can be device_put/sharded as one unit.
"""
from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class JaggedIds:
    """A jagged list of ids per sample (one sparse feature)."""

    values: jax.Array   # [cap] int64/int32, padded with 0
    lengths: jax.Array  # [B] int32
    offsets: jax.Array  # [B+1] int32
    max_len: int = struct.field(pytree_node=False)

    @property
    def capacity(self) -> int:
        return self.values.shape[0]


@struct.dataclass
class HSTUBatch:
    """One training/eval batch.

    features: name -> JaggedIds. The item feature contains history followed
    by candidates (when num_candidates is set). Contextual features hold
    <= 1 token per sample typically.
    labels: per-candidate (or per-item when no candidates) bit-encoded
    multi-task labels, static capacity aligned with the item feature or the
    candidate count (reference: hstu_batch.py:419-484).
    """

    features: Dict[str, JaggedIds]
    batch_size: int = struct.field(pytree_node=False)
    feature_to_max_seqlen: Mapping[str, int] = struct.field(pytree_node=False)
    item_feature_name: str = struct.field(pytree_node=False)
    action_feature_name: Optional[str] = struct.field(pytree_node=False, default=None)
    contextual_feature_names: Tuple[str, ...] = struct.field(
        pytree_node=False, default=()
    )
    max_num_candidates: int = struct.field(pytree_node=False, default=0)
    num_candidates: Optional[jax.Array] = None  # [B] int32
    labels: Optional[jax.Array] = None          # [label_cap] int32
    label_lengths: Optional[jax.Array] = None   # [B] int32
    timestamps: Optional[jax.Array] = None      # aligned with item values


def host_array(x, dtype=None) -> np.ndarray:
    """Canonicalized HOST (numpy) batch leaf. Batch producers must never
    create jax arrays: producers run on the prefetch worker thread, and a
    second thread issuing transfers against the (experimental) TPU client
    concurrently with the main thread's compiled-step dispatches
    intermittently corrupts batch transfers (observed as nondeterministic
    non-finite params after a step; reference keeps its dataloader on the
    host side the same way, train_pipeline.py:95). Dtypes mirror jax
    canonicalization (x64 disabled) so switching producers from
    jnp.asarray to host arrays changes nothing inside jit."""
    a = np.asarray(x)
    if a.dtype == np.int64:
        a = a.astype(np.int32)
    elif a.dtype == np.float64:
        a = a.astype(np.float32)
    elif a.dtype == np.uint64:
        a = a.astype(np.uint32)
    return a


def as_device_batch(batch):
    """Coerce a host (numpy-leaf) batch to jax arrays. No-op for tracers
    and device arrays — models call this at their entry so closure-captured
    host batches can't hit numpy fancy-indexing with traced indices."""
    return jax.tree_util.tree_map(jnp.asarray, batch)


def _zipf_lengths(rng: np.random.Generator, a: float, batch: int, max_len: int):
    ln = rng.zipf(a, size=(batch,)).astype(np.int64)
    # fold extreme draws back into range, keep at least 1
    ln = np.minimum((ln - 1) % max_len + 1, max_len)
    return ln.astype(np.int32)


def random_hstu_batch(
    seed: int,
    batch_size: int,
    max_history_len: int,
    item_vocab: int,
    *,
    action_vocab: int = 0,
    contextual_vocabs: Optional[Mapping[str, int]] = None,
    max_num_candidates: int = 0,
    num_tasks: int = 1,
    zipf_a: float = 1.2,
    full_capacity: bool = False,
    token_capacity: int = 0,
    value_zipf: Optional[Mapping[str, float]] = None,
) -> HSTUBatch:
    """Synthetic batch with Zipf-distributed history lengths
    (reference: hstu_batch.py:376 `HSTUBatch.random`).

    `full_capacity=True` makes every sequence max-length (for benchmarking
    the dense-compute upper bound).
    `value_zipf`: feature name -> alpha; those features draw their ids from
    Zipf(alpha) folded into the vocab (hot-key skew; the reference E2E
    benchmark uses Zipf(1.05) ids for item/user_id via
    `FeatureArgs.value_dists` — hstu_batch.py:42 RandomDistribution)."""
    rng = np.random.default_rng(seed)
    value_zipf = value_zipf or {}
    if full_capacity:
        hist = np.full((batch_size,), max_history_len, np.int32)
    else:
        hist = _zipf_lengths(rng, zipf_a, batch_size, max_history_len)
    ncand = None
    if max_num_candidates > 0:
        ncand = rng.integers(1, max_num_candidates + 1, size=(batch_size,))
        ncand = ncand.astype(np.int32)
    item_len = hist + (ncand if ncand is not None else 0)
    item_max = max_history_len + max_num_candidates
    cap = batch_size * item_max
    # token_capacity: static values-buffer size. Real pipelines bucket this
    # near sum(len) — the varlen kernels and the embedding path then do
    # work proportional to actual tokens, not to batch*max_len (the
    # reference's packed-KJT property). -1 = auto-tight (total tokens
    # rounded up to 512).
    if token_capacity == -1:
        token_capacity = int(-(-int(item_len.sum()) // 512) * 512)
    if token_capacity > 0:
        total = int(item_len.sum())
        assert token_capacity >= total, (token_capacity, total)
        cap = min(cap, token_capacity)

    def mk_ids(lengths, capacity, vocab, zipf_alpha=None):
        total = int(lengths.sum())
        vals = np.zeros((capacity,), np.int64)
        if zipf_alpha is not None:
            draw = rng.zipf(zipf_alpha, size=(total,)).astype(np.int64)
            vals[:total] = (draw - 1) % vocab
        else:
            vals[:total] = rng.integers(0, vocab, size=(total,))
        offs = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
        return JaggedIds(
            values=host_array(vals),
            lengths=host_array(lengths.astype(np.int32)),
            offsets=host_array(offs),
            max_len=int(capacity // batch_size),
        )

    features = {"item": mk_ids(item_len, cap, item_vocab, value_zipf.get("item"))}
    feature_to_max_seqlen = {"item": item_max}
    action_name = None
    if action_vocab > 0:
        action_name = "action"
        features["action"] = mk_ids(
            item_len, cap, action_vocab, value_zipf.get("action")
        )
        feature_to_max_seqlen["action"] = item_max
    ctx_names = ()
    if contextual_vocabs:
        ctx_names = tuple(contextual_vocabs.keys())
        for name, vocab in contextual_vocabs.items():
            ln = np.ones((batch_size,), np.int32)
            features[name] = mk_ids(ln, batch_size, vocab, value_zipf.get(name))
            feature_to_max_seqlen[name] = 1

    if ncand is not None:
        label_len = ncand
        label_cap = batch_size * max_num_candidates
    else:
        label_len = item_len
        label_cap = cap
    total_labels = int(label_len.sum())
    lab = np.zeros((label_cap,), np.int32)
    lab[:total_labels] = rng.integers(0, 1 << num_tasks, size=(total_labels,))

    return HSTUBatch(
        features=features,
        batch_size=batch_size,
        feature_to_max_seqlen=feature_to_max_seqlen,
        item_feature_name="item",
        action_feature_name=action_name,
        contextual_feature_names=ctx_names,
        max_num_candidates=max_num_candidates,
        num_candidates=None if ncand is None else host_array(ncand),
        labels=host_array(lab),
        label_lengths=host_array(label_len.astype(np.int32)),
    )
