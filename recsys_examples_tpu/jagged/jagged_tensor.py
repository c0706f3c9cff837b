"""Jagged tensor containers for TPU (static-shape, mask-based).

TPU/XLA requires static shapes, so jagged ("ragged") data is stored as a
flattened values buffer padded to a static total length, plus per-sequence
lengths/offsets.  All jagged semantics are expressed through lengths and
masks rather than dynamic shapes, which lets every op trace once under jit.

Mirrors the role of the reference's ``JaggedData``
(reference: examples/hstu/modules/jagged_data.py:24) but is a JAX pytree:
``values`` / lengths / offsets are array leaves; bucketed maxima are static
aux fields so they participate in trace caching.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


def lengths_to_offsets(lengths: jax.Array) -> jax.Array:
    """[B] lengths -> [B+1] exclusive-cumsum offsets (complete offsets)."""
    return jnp.concatenate(
        [jnp.zeros((1,), lengths.dtype), jnp.cumsum(lengths)], axis=0
    )


@struct.dataclass
class JaggedData:
    """The jagged activation container threaded through all HSTU layers.

    values:           [T, D] flattened tokens, padded to static T.
    seqlen:           [B] int32 actual per-sample length (tokens in `values`).
    seqlen_offsets:   [B+1] int32.
    max_seqlen:       static upper bound of per-sample length (trace constant).
    num_candidates:   [B] int32 or None — trailing candidate items per sample.
    contextual_seqlen:[B] int32 or None — leading contextual tokens per sample.
    scaling_seqlen:   static int; attention denominator (-1 => max_seqlen).

    Total valid tokens = seqlen_offsets[-1]; rows beyond that in `values` are
    zero padding and must be masked by consumers.
    """

    values: jax.Array
    seqlen: jax.Array
    seqlen_offsets: jax.Array

    max_seqlen: int = struct.field(pytree_node=False)

    max_num_candidates: int = struct.field(pytree_node=False, default=0)
    num_candidates: Optional[jax.Array] = None
    num_candidates_offsets: Optional[jax.Array] = None

    contextual_max_seqlen: int = struct.field(pytree_node=False, default=0)
    contextual_seqlen: Optional[jax.Array] = None
    contextual_seqlen_offsets: Optional[jax.Array] = None

    has_interleaved_action: bool = struct.field(pytree_node=False, default=False)
    scaling_seqlen: int = struct.field(pytree_node=False, default=-1)

    # Block-aligned jagged layout (ops/pallas/hstu_attention.attn_alignment):
    # when values_aligned, `values` is [T_al, D] with each sequence start
    # rounded to the attention row alignment; packed_total remembers the
    # packed T for relayout/bounds.
    values_aligned: bool = struct.field(pytree_node=False, default=False)
    packed_total: int = struct.field(pytree_node=False, default=0)

    @property
    def batch_size(self) -> int:
        return self.seqlen.shape[0]

    @property
    def total_len(self) -> int:
        """Static padded total length of the values buffer."""
        return self.values.shape[0]

    @property
    def hidden_dim(self) -> int:
        return self.values.shape[-1]

    def replace_values(self, values: jax.Array) -> "JaggedData":
        """Shallow copy with new values (metadata shared)."""
        return self.replace(values=values)

    def token_mask(self) -> jax.Array:
        """[T] bool — True for valid (non-padding) rows of `values`."""
        total = self.seqlen_offsets[-1]
        return jnp.arange(self.values.shape[0], dtype=jnp.int32) < total


def make_jagged_data(
    values: jax.Array,
    seqlen: jax.Array,
    max_seqlen: int,
    *,
    num_candidates: Optional[jax.Array] = None,
    max_num_candidates: int = 0,
    contextual_seqlen: Optional[jax.Array] = None,
    contextual_max_seqlen: int = 0,
    has_interleaved_action: bool = False,
    scaling_seqlen: int = -1,
) -> JaggedData:
    seqlen = seqlen.astype(jnp.int32)
    jd = JaggedData(
        values=values,
        seqlen=seqlen,
        seqlen_offsets=lengths_to_offsets(seqlen),
        max_seqlen=max_seqlen,
        max_num_candidates=max_num_candidates,
        num_candidates=None
        if num_candidates is None
        else num_candidates.astype(jnp.int32),
        num_candidates_offsets=None
        if num_candidates is None
        else lengths_to_offsets(num_candidates.astype(jnp.int32)),
        contextual_max_seqlen=contextual_max_seqlen,
        contextual_seqlen=None
        if contextual_seqlen is None
        else contextual_seqlen.astype(jnp.int32),
        contextual_seqlen_offsets=None
        if contextual_seqlen is None
        else lengths_to_offsets(contextual_seqlen.astype(jnp.int32)),
        has_interleaved_action=has_interleaved_action,
        scaling_seqlen=scaling_seqlen,
    )
    return jd


def random_jagged_data(
    key: jax.Array,
    seqlen: jax.Array,
    dim: int,
    max_seqlen: int,
    total_len: int,
    *,
    num_candidates: Optional[jax.Array] = None,
    max_num_candidates: int = 0,
    contextual_seqlen: Optional[jax.Array] = None,
    contextual_max_seqlen: int = 0,
    dtype=jnp.float32,
) -> JaggedData:
    """Random JaggedData for tests/benchmarks (reference: jagged_data.py:90)."""
    values = jax.random.uniform(key, (total_len, dim), dtype=dtype)
    jd = make_jagged_data(
        values,
        seqlen,
        max_seqlen,
        num_candidates=num_candidates,
        max_num_candidates=max_num_candidates,
        contextual_seqlen=contextual_seqlen,
        contextual_max_seqlen=contextual_max_seqlen,
    )
    # zero out the padding rows so reductions over values are exact
    mask = jd.token_mask()[:, None].astype(dtype)
    return jd.replace(values=values * mask)
