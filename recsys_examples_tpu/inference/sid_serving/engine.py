"""SID-GR serving engine: bucketed, jit-cached batched beam generation.

Counterpart of the reference serving core
(examples/sid-gr-inference/src/gr_inference/gr_serving/engine.py:61
`GRServingEngine` + decode_cuda_graph.py / prefill_cuda_graph.py).

TPU design: one compiled executable per (batch_bucket, ctx_bucket) runs the
whole prefill + H-step KV-cached beam decode (models/sid_gr.py
`generate_beam_decode`). jit-compiled executables on static bucket shapes
are the TPU analogue of the reference's captured CUDA graphs: first request
of a bucket pays compilation, every subsequent request replays.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from recsys_examples_tpu.data.sid_batch import SIDBatch
from recsys_examples_tpu.models.sid_gr import SIDGRConfig, SIDGRModel


@dataclasses.dataclass(frozen=True)
class ServingConfig:
    beam_width: int = 64
    ctx_buckets: Tuple[int, ...] = (64, 256, 1024)    # context tokens
    batch_buckets: Tuple[int, ...] = (1, 4, 8)
    max_batch_tokens: int = 16384      # admission memory budget


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"{n} exceeds max bucket {buckets[-1]}")


class GRServingEngine:
    def __init__(self, model: SIDGRModel, params, cfg: ServingConfig):
        self.model = model
        self.params = params
        self.cfg = cfg
        self._fns: Dict[Tuple[int, int], callable] = {}
        self.compile_count = 0

    def _fn(self, B: int, N: int):
        key = (B, N)
        if key not in self._fns:
            W = self.cfg.beam_width

            def gen(params, batch):
                return self.model.apply(
                    {"params": params}, batch, beam_width=W,
                    method=SIDGRModel.generate_beam_decode,
                )

            self._fns[key] = jax.jit(gen)
            self.compile_count += 1
        return self._fns[key]

    def generate(
        self, contexts: List[np.ndarray]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """contexts: per-request flat SID history streams.

        Returns (paths [B, W, H], scores [B, W])."""
        B = len(contexts)
        Bb = _bucket(B, self.cfg.batch_buckets)
        H = self.model.config.num_hierarchies
        maxlen = max((len(c) for c in contexts), default=1)
        maxlen = max(maxlen, H)
        N = _bucket(maxlen, self.cfg.ctx_buckets)
        cap = Bb * N
        sids = np.zeros((cap,), np.int32)
        lens = np.zeros((Bb,), np.int32)
        pos = 0
        for i, c in enumerate(contexts):
            n = len(c) - (len(c) % H)  # whole items only
            sids[pos:pos + n] = c[:n]
            lens[i] = n
            pos += n
        offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
        batch = SIDBatch(
            history_sids=jnp.asarray(sids),
            history_lengths=jnp.asarray(lens),
            history_offsets=jnp.asarray(offs),
            candidate_sids=jnp.zeros((Bb, H), jnp.int32),
            batch_size=Bb,
            num_hierarchies=H,
            max_history_tokens=N,
        )
        paths, scores = self._fn(Bb, N)(self.params, batch)
        return np.asarray(paths)[:B], np.asarray(scores)[:B]

    def warmup(self):
        """Pre-compile all bucket combinations (graph 'capture' phase)."""
        H = self.model.config.num_hierarchies
        for Bb in self.cfg.batch_buckets:
            for N in self.cfg.ctx_buckets:
                self.generate([np.zeros((min(H, N),), np.int32)] * Bb)


class Qwen3ServingEngine(GRServingEngine):
    """Serving engine over the Qwen3 backbone (reference:
    gr_serving/engine.py wired to gr_models/qwen3). Contexts are flat SID
    token streams in the Qwen3 vocab; generation runs the KV-cached beam
    runtime (qwen3_runtime.qwen3_generate_beam)."""

    def __init__(self, model, params, cfg: ServingConfig, num_steps: int,
                 logits_mask_fn=None, attn_backend: str = "auto"):
        super().__init__(model, params, cfg)
        self.num_steps = num_steps
        self.logits_mask_fn = logits_mask_fn
        self.attn_backend = attn_backend

    def _fn(self, B: int, N: int):
        key = (B, N)
        if key not in self._fns:
            from recsys_examples_tpu.inference.sid_serving.qwen3_runtime import (
                qwen3_generate_beam,
            )
            W = self.cfg.beam_width

            def gen(params, tokens, lengths):
                return qwen3_generate_beam(
                    self.model, params, tokens, lengths,
                    num_steps=self.num_steps, beam_width=W,
                    logits_mask_fn=self.logits_mask_fn,
                    backend=self.attn_backend,
                )

            self._fns[key] = jax.jit(gen)
            self.compile_count += 1
        return self._fns[key]

    def generate(self, contexts):
        B = len(contexts)
        Bb = _bucket(B, self.cfg.batch_buckets)
        maxlen = max((len(c) for c in contexts), default=1)
        N = _bucket(max(maxlen, 1), self.cfg.ctx_buckets)
        tokens = np.zeros((Bb, N), np.int32)
        lens = np.zeros((Bb,), np.int32)
        for i, c in enumerate(contexts):
            tokens[i, :len(c)] = c
            lens[i] = len(c)
        lens = np.maximum(lens, 1)  # empty rows decode from position 0
        paths, scores = self._fn(Bb, N)(
            self.params, jnp.asarray(tokens), jnp.asarray(lens)
        )
        return np.asarray(paths)[:B], np.asarray(scores)[:B]

    def warmup(self):
        for Bb in self.cfg.batch_buckets:
            for N in self.cfg.ctx_buckets:
                self.generate([np.zeros((1,), np.int32)] * Bb)
