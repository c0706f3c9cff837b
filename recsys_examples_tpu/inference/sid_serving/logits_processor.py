"""Logits-processor pipeline for SID-GR serving.

Counterpart of the reference's processor chain
(examples/sid-gr-inference/src/gr_inference/gr_runtime/logits_processor.py:
temperature / top-k / constraint processors composed in order and applied
to each decode step's logits before beam propagation).

TPU design: processors are pure functions traced INTO the step
executables (the chain is fixed per scheduler, like the reference's
engine-level pipeline), operating on log-probabilities [B, W, V] with the
step index and the paths decoded so far. Composition order matters:
temperature rescales, top-k and constraints mask with -inf.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


class LogitsProcessor:
    """Base: __call__(step, logp [B, W, V], paths [B, W, step]) -> logp."""

    def __call__(self, step: int, logp: jax.Array,
                 paths: jax.Array) -> jax.Array:
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class TemperatureProcessor(LogitsProcessor):
    """Rescale logits by 1/temperature then re-normalize (reference:
    TemperatureLogitsProcessor). temperature=1 is the identity; <1
    sharpens, >1 flattens the beam-score distribution."""

    temperature: float = 1.0

    def __call__(self, step, logp, paths):
        if self.temperature == 1.0:
            return logp
        return jax.nn.log_softmax(logp / self.temperature, axis=-1)


@dataclasses.dataclass(frozen=True)
class TopKProcessor(LogitsProcessor):
    """Keep each beam's k best tokens, -inf the rest (reference:
    TopKLogitsProcessor). k=0 disables."""

    k: int = 0

    def __call__(self, step, logp, paths):
        if self.k <= 0 or self.k >= logp.shape[-1]:
            return logp
        kth = jax.lax.top_k(logp, self.k)[0][..., -1:]
        return jnp.where(logp >= kth, logp, -jnp.inf)


@dataclasses.dataclass(frozen=True)
class ConstraintProcessor(LogitsProcessor):
    """Wrap an item-constraint mask fn (inference/sid_serving/
    item_constraints.py; reference: gr_runtime/item_constraints.py):
    mask_fn(step, paths [B, W, step]) -> additive mask [B, W, V]
    (0 allowed / -inf banned)."""

    mask_fn: Callable[[int, jax.Array], jax.Array] = None

    def __call__(self, step, logp, paths):
        if self.mask_fn is None:
            return logp
        return logp + self.mask_fn(step, paths)


@dataclasses.dataclass(frozen=True)
class LogitsProcessorChain(LogitsProcessor):
    """Ordered composition (reference: the gr_runtime pipeline list)."""

    processors: Tuple[LogitsProcessor, ...] = ()

    def __call__(self, step, logp, paths):
        for p in self.processors:
            logp = p(step, logp, paths)
        return logp

    def __bool__(self):
        return bool(self.processors)


@dataclasses.dataclass(frozen=True)
class TokenSuppressProcessor(LogitsProcessor):
    """-inf the listed token ids, optionally only at the listed hierarchy
    steps (reference: TokenSuppressLogitsProcessor with phases;
    gr_runtime/logits_processor.py:28). `steps=None` = every step."""

    token_ids: Tuple[int, ...] = ()
    steps: Optional[Tuple[int, ...]] = None
    fill_value: float = -jnp.inf

    def __call__(self, step, logp, paths):
        if not self.token_ids:
            return logp
        if self.steps is not None and step not in self.steps:
            return logp
        ids = jnp.asarray(self.token_ids, jnp.int32)
        mask = jnp.zeros((logp.shape[-1],), bool).at[ids].set(True)
        return jnp.where(mask, self.fill_value, logp)


@dataclasses.dataclass(frozen=True)
class TokenBiasProcessor(LogitsProcessor):
    """Additive per-token log-prob bias (reference:
    TokenBiasLogitsProcessor, gr_runtime/logits_processor.py:63).
    `token_bias` maps token id -> additive bias."""

    token_bias: Tuple[Tuple[int, float], ...] = ()
    steps: Optional[Tuple[int, ...]] = None

    def __call__(self, step, logp, paths):
        if not self.token_bias:
            return logp
        if self.steps is not None and step not in self.steps:
            return logp
        bias = jnp.zeros((logp.shape[-1],), logp.dtype)
        ids = jnp.asarray([t for t, _ in self.token_bias], jnp.int32)
        vals = jnp.asarray([b for _, b in self.token_bias], logp.dtype)
        return logp + bias.at[ids].add(vals)


def processor_from_spec(spec: dict) -> LogitsProcessor:
    """Build a processor from an HTTP/request JSON spec (reference:
    logits_processor_from_spec — same type aliases and keys)."""
    ptype = spec.get("type")
    steps = spec.get("steps")
    steps = None if steps is None else tuple(int(s) for s in steps)
    if ptype in ("token_suppress", "suppress_tokens", "bad_tokens"):
        ids = spec.get("token_ids", spec.get("suppressed_token_ids"))
        if ids is None:
            raise ValueError("token_suppress requires token_ids")
        return TokenSuppressProcessor(
            tuple(int(t) for t in ids), steps=steps,
            fill_value=float(spec.get("fill_value", -jnp.inf)),
        )
    if ptype in ("token_bias", "bias_tokens"):
        bias = spec.get("token_bias", spec.get("biases"))
        if bias is None:
            raise ValueError("token_bias requires token_bias")
        items = bias.items() if hasattr(bias, "items") else bias
        return TokenBiasProcessor(
            tuple((int(t), float(b)) for t, b in items), steps=steps,
        )
    if ptype == "temperature":
        return TemperatureProcessor(float(spec.get("temperature", 1.0)))
    if ptype == "top_k":
        return TopKProcessor(int(spec.get("k", 0)))
    raise ValueError(f"unsupported logits processor type: {ptype!r}")


def processors_from_specs(specs) -> LogitsProcessorChain:
    if specs is None:
        return LogitsProcessorChain(())
    return LogitsProcessorChain(
        tuple(processor_from_spec(s) for s in specs)
    )


def make_chain(
    temperature: float = 1.0,
    top_k: int = 0,
    constraint_mask_fn: Optional[Callable] = None,
) -> LogitsProcessorChain:
    """Convenience factory matching the reference's default pipeline
    order: temperature -> top-k -> constraints."""
    procs = []
    if temperature != 1.0:
        procs.append(TemperatureProcessor(temperature))
    if top_k > 0:
        procs.append(TopKProcessor(top_k))
    if constraint_mask_fn is not None:
        procs.append(ConstraintProcessor(constraint_mask_fn))
    return LogitsProcessorChain(tuple(procs))
