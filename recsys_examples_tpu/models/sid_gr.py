"""SID-GR: hierarchical semantic-ID generative recommender.

Counterpart of the reference `SIDGRModel`
(examples/sid_gr/model/gpt_model.py:186): per-hierarchy codebook
embeddings, BOS token before the candidate, causal decoder, per-hierarchy
(or shared) LM heads, CE loss on candidate SID tokens; `generate` (no-KV
baseline re-running the prefix per hierarchy, gpt_model.py:681) and
`generate_beam_decode` (prefill + context-KV + per-step beam attention,
gpt_model.py:853) for inference.

TPU layout: the decoder runs on padded dense [B, N, D] (SID sequences are
short; XLA batched matmuls at near peak). Training sequence per sample:
  [history SIDs ... , BOS, candidate SIDs[0..H-2]]
with CE supervision at the positions predicting candidate SIDs[0..H-1].
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from recsys_examples_tpu.data.sid_batch import SIDBatch
from recsys_examples_tpu.models.beam_search import (
    BeamState,
    decode_paths,
    first_expand,
    init_beam,
    propagate,
)
from recsys_examples_tpu.modules.transformer import (
    BeamAttnInputs,
    TransformerStack,
    make_padded_causal_mask,
)
from recsys_examples_tpu.ops.jagged import jagged_to_padded_dense


@dataclasses.dataclass(frozen=True)
class SIDGRConfig:
    num_hierarchies: int = 4
    codebook_size: int = 256
    hidden_size: int = 256
    num_layers: int = 4
    num_heads: int = 4
    head_dim: int = 64
    ffn_hidden: int = 1024
    dropout: float = 0.0
    share_lm_head: bool = False
    share_codebook: bool = False
    dtype: jnp.dtype = jnp.float32
    beam_width: int = 32


class SIDGRModel(nn.Module):
    config: SIDGRConfig

    def setup(self):
        cfg = self.config
        n_books = 1 if cfg.share_codebook else cfg.num_hierarchies
        self.codebooks = [
            nn.Embed(
                cfg.codebook_size, cfg.hidden_size,
                name=f"codebook_{i}",
                embedding_init=nn.initializers.normal(
                    1.0 / cfg.hidden_size ** 0.5
                ),
            )
            for i in range(n_books)
        ]
        self.bos_token = self.param(
            "bos_token", nn.initializers.normal(0.02), (cfg.hidden_size,)
        )
        self.decoder = TransformerStack(
            cfg.num_layers, cfg.num_heads, cfg.head_dim, cfg.ffn_hidden,
            cfg.dropout, cfg.dtype, name="decoder",
        )
        n_heads = 1 if cfg.share_lm_head else cfg.num_hierarchies
        self.lm_heads = [
            nn.Dense(cfg.codebook_size, dtype=jnp.float32, name=f"lm_head_{i}")
            for i in range(n_heads)
        ]

    # ------------------------------------------------------------ embed
    def _book(self, h: int):
        return self.codebooks[0 if self.config.share_codebook else h]

    def _head(self, h: int):
        return self.lm_heads[0 if self.config.share_lm_head else h]

    def _embed_history(self, batch: SIDBatch) -> jax.Array:
        """[cap, D]; token at flat position p belongs to hierarchy p % H."""
        cfg = self.config
        cap = batch.history_sids.shape[0]
        hier = jnp.arange(cap, dtype=jnp.int32) % cfg.num_hierarchies
        # history positions are per-sequence, but lengths are multiples of
        # H and sequences start at multiples of H in the flat buffer only
        # if capacities are; use per-sample position instead:
        from recsys_examples_tpu.ops.jagged import row_to_batch

        b = row_to_batch(batch.history_offsets, cap)
        pos = jnp.arange(cap, dtype=jnp.int32) - batch.history_offsets[b]
        hier = pos % cfg.num_hierarchies
        embs = jnp.stack(
            [bk(batch.history_sids) for bk in self.codebooks], axis=1
        )  # [cap, n_books, D]
        if cfg.share_codebook:
            out = embs[:, 0]
        else:
            out = jnp.take_along_axis(embs, hier[:, None, None], axis=1)[:, 0]
        return out.astype(cfg.dtype)

    def _build_train_sequence(self, batch: SIDBatch):
        """Padded dense input [B, N, D], lengths, supervision positions.

        Per sample: history tokens, then BOS, then candidate[0..H-2].
        Position predicting candidate[h] = len_hist + h (0-indexed: the BOS
        position predicts candidate[0]).
        """
        cfg = self.config
        B = batch.batch_size
        H = cfg.num_hierarchies
        N = batch.max_history_tokens + H  # + BOS + H-1 candidate tokens
        hist = self._embed_history(batch)
        dense = jagged_to_padded_dense(
            hist, batch.history_offsets, N
        )  # [B, N, D] (history only; tail zero)
        # write BOS at len, candidates at len+1+h
        lens = batch.history_lengths.astype(jnp.int32)
        bidx = jnp.arange(B)
        dense = dense.at[bidx, lens].set(self.bos_token.astype(cfg.dtype))
        cand_emb = jnp.stack(
            [
                self._book(h)(batch.candidate_sids[:, h]).astype(cfg.dtype)
                for h in range(H)
            ],
            axis=1,
        )  # [B, H, D]
        for h in range(H - 1):
            dense = dense.at[bidx, lens + 1 + h].set(cand_emb[:, h])
        total_lens = lens + H  # hist + bos + (H-1) candidates
        return dense, total_lens, lens

    # ------------------------------------------------------------ forward
    def __call__(
        self, batch: SIDBatch, train: bool = True
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        cfg = self.config
        H = cfg.num_hierarchies
        dense, total_lens, hist_lens = self._build_train_sequence(batch)
        N = dense.shape[1]
        mask = make_padded_causal_mask(total_lens, N)
        hidden = self.decoder(dense, mask=mask, train=train)
        bidx = jnp.arange(batch.batch_size)
        loss = 0.0
        per_h_loss = []
        for h in range(H):
            pos = hist_lens + h  # BOS at hist_lens predicts candidate[0]
            hs = hidden[bidx, pos]  # [B, D]
            logits = self._head(h)(hs.astype(jnp.float32))
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(
                logp, batch.candidate_sids[:, h][:, None], axis=1
            )[:, 0]
            l = nll.mean()
            per_h_loss.append(l)
            loss = loss + l
        loss = loss / H
        return loss, {
            "loss": loss,
            "per_hierarchy_loss": jnp.stack(per_h_loss),
        }

    # ------------------------------------------------------------ generate
    def generate(self, batch: SIDBatch, beam_width: Optional[int] = None):
        """No-KV baseline beam generation: re-runs the full prefix for every
        hierarchy (reference: gpt_model.py:681 `generate`). Returns
        (paths [B, W, H], scores [B, W])."""
        cfg = self.config
        W = beam_width or cfg.beam_width
        H = cfg.num_hierarchies
        B = batch.batch_size
        hist = self._embed_history(batch)
        N0 = batch.max_history_tokens + 1
        base = jagged_to_padded_dense(hist, batch.history_offsets, N0 + H - 1)
        lens = batch.history_lengths.astype(jnp.int32)
        bidx = jnp.arange(B)
        base = base.at[bidx, lens].set(self.bos_token.astype(cfg.dtype))

        state = init_beam(B, W, H)
        # hierarchy 0: single context
        mask = make_padded_causal_mask(lens + 1, base.shape[1])
        hidden = self.decoder(base, mask=mask, train=False)
        hs = hidden[bidx, lens]
        logp0 = jax.nn.log_softmax(
            self._head(0)(hs.astype(jnp.float32)), axis=-1
        )
        state = first_expand(state, logp0)

        # hierarchies 1..H-1: re-run prefix per beam (expensive baseline)
        for h in range(1, H):
            # build [B*W, N0+h] sequences: history + bos + tokens so far
            paths = decode_paths(state)  # [B, W, H] (first h valid)
            seq = jnp.repeat(base, W, axis=0)  # [B*W, N, D]
            lens_bw = jnp.repeat(lens, W)
            bw = jnp.arange(B * W)
            for hh in range(h):
                tok = paths[:, :, hh].reshape(B * W)
                emb = self._book(hh)(tok).astype(cfg.dtype)
                seq = seq.at[bw, lens_bw + 1 + hh].set(emb)
            mask = make_padded_causal_mask(lens_bw + 1 + h, seq.shape[1])
            hidden = self.decoder(seq, mask=mask, train=False)
            hs = hidden[bw, lens_bw + h]  # position of last token
            logp = jax.nn.log_softmax(
                self._head(h)(hs.astype(jnp.float32)), axis=-1
            ).reshape(B, W, cfg.codebook_size)
            state = propagate(state, logp)
        return decode_paths(state), state.scores

    def generate_beam_decode(
        self, batch: SIDBatch, beam_width: Optional[int] = None,
        attn_backend: str = "auto",
    ):
        """KV-cached beam decode: one prefill over [history, BOS], then H-1
        steps through the fused beam-decode attention kernel — context KV is
        read once per batch (never repeated over beams) and per-beam KV is
        never reordered: each step passes ancestry indices instead
        (reference: gpt_model.py:853 `generate_beam_decode` +
        gr_decode_atten/interface.py:835; ancestry construction mirrors
        beam_search.py:161 `build_beam_topk_indices`).

        Returns (paths [B, W, H], scores [B, W])."""
        cfg = self.config
        W = beam_width or cfg.beam_width
        H = cfg.num_hierarchies
        B = batch.batch_size
        L = cfg.num_layers
        nH, dh = cfg.num_heads, cfg.head_dim
        hist = self._embed_history(batch)
        N0 = batch.max_history_tokens + 1
        base = jagged_to_padded_dense(hist, batch.history_offsets, N0)
        lens = batch.history_lengths.astype(jnp.int32)
        bidx = jnp.arange(B)
        base = base.at[bidx, lens].set(self.bos_token.astype(cfg.dtype))

        # prefill: full causal pass, keep per-layer context KV
        mask = make_padded_causal_mask(lens + 1, N0)
        hidden, ctx_kv = self.decoder(
            base, mask=mask, train=False, return_kv=True
        )
        hs = hidden[bidx, lens]
        logp0 = jax.nn.log_softmax(
            self._head(0)(hs.astype(jnp.float32)), axis=-1
        )
        state = init_beam(B, W, H)
        state = first_expand(state, logp0)

        # per-layer decode-side KV store [B, H-1, W, nH, dh] (never
        # reordered; ancestry indices resolve paths instead)
        beam_k = [
            jnp.zeros((B, H - 1, W, nH, dh), cfg.dtype) for _ in range(L)
        ]
        beam_v = [
            jnp.zeros((B, H - 1, W, nH, dh), cfg.dtype) for _ in range(L)
        ]
        # A[:, n, w] = beam slot holding step-n KV on current beam w's path
        A = jnp.zeros((B, H - 1, W), jnp.int32)
        ctx_lens = lens + 1  # history + BOS

        for h in range(1, H):
            par = state.parents[:, h - 1, :]  # [B, W]
            if h > 1:
                # re-root ancestry through this step's parents
                reroot = jnp.take_along_axis(
                    A[:, : h - 1], par[:, None, :], axis=2
                )
                A = A.at[:, : h - 1].set(reroot)
            tok = state.tokens[:, h - 1, :]  # [B, W]
            x = self._book(h - 1)(tok).astype(cfg.dtype)  # [B, W, D]
            beam_inputs = [
                BeamAttnInputs(
                    k_ctx=ctx_kv[li][0], v_ctx=ctx_kv[li][1],
                    ctx_lens=ctx_lens,
                    k_beam=beam_k[li][:, : h - 1] if h > 1 else None,
                    v_beam=beam_v[li][:, : h - 1] if h > 1 else None,
                    ancestry=A[:, : h - 1] if h > 1 else None,
                    backend=attn_backend,
                )
                for li in range(L)
            ]
            hidden, new_kv = self.decoder(
                x, train=False, beam_attn=beam_inputs
            )
            for li in range(L):
                beam_k[li] = beam_k[li].at[:, h - 1].set(new_kv[li][0])
                beam_v[li] = beam_v[li].at[:, h - 1].set(new_kv[li][1])
            # the step-(h-1) KV lives at its own beam slot
            A = A.at[:, h - 1].set(
                jnp.broadcast_to(
                    jnp.arange(W, dtype=jnp.int32)[None], (B, W)
                )
            )
            logp = jax.nn.log_softmax(
                self._head(h)(hidden.astype(jnp.float32)), axis=-1
            )
            state = propagate(state, logp)
        return decode_paths(state), state.scores

    # -------------------------------------------------- stepwise decode
    # Split of generate_beam_decode for the continuous serving scheduler
    # (reference: gr_serving/continuous.py interleaves prefill admission
    # with per-step decode batches; decode state lives in pooled arrays).
    def beam_prefill(
        self, batch: SIDBatch, beam_width: Optional[int] = None,
        width_pad: Optional[int] = None, logits_processor=None,
    ):
        """Prefill + hierarchy-0 expansion at `beam_width`, padded to
        `width_pad` slots (extra beams get -inf scores) so pooled decode
        state has one static width.

        Returns a carry dict:
          scores [B, Wm], tokens [B, H, Wm], parents [B, H, Wm],
          ctx_k/ctx_v [L, B, N0, nH, dh], ctx_lens [B],
          beam_k/beam_v [L, B, H-1, Wm, nH, dh], anc [B, H-1, Wm].
        """
        cfg = self.config
        W = beam_width or cfg.beam_width
        Wm = width_pad or W
        assert Wm >= W
        H = cfg.num_hierarchies
        B = batch.batch_size
        L = cfg.num_layers
        nH, dh = cfg.num_heads, cfg.head_dim
        hist = self._embed_history(batch)
        N0 = batch.max_history_tokens + 1
        base = jagged_to_padded_dense(hist, batch.history_offsets, N0)
        lens = batch.history_lengths.astype(jnp.int32)
        bidx = jnp.arange(B)
        base = base.at[bidx, lens].set(self.bos_token.astype(cfg.dtype))
        mask = make_padded_causal_mask(lens + 1, N0)
        hidden, ctx_kv = self.decoder(
            base, mask=mask, train=False, return_kv=True
        )
        hs = hidden[bidx, lens]
        logp0 = jax.nn.log_softmax(
            self._head(0)(hs.astype(jnp.float32)), axis=-1
        )
        if logits_processor is not None:
            # processor contract is (step, logp [B, W, V], paths [B, W,
            # step]); at prefill there is one implicit beam and no prefix
            logp0 = logits_processor(
                0, logp0[:, None, :], jnp.zeros((B, 1, 0), jnp.int32)
            )[:, 0]
        state = init_beam(B, W, H)
        state = first_expand(state, logp0)

        def pad_w(x, axis):
            if Wm == W:
                return x
            pw = [(0, 0)] * x.ndim
            pw[axis] = (0, Wm - W)
            return jnp.pad(x, pw)

        scores = pad_w(state.scores, 1)
        if Wm > W:
            scores = scores.at[:, W:].set(-jnp.inf)
        return {
            "scores": scores,
            "tokens": pad_w(state.tokens, 2),
            "parents": pad_w(state.parents, 2),
            "ctx_k": jnp.stack([kv[0] for kv in ctx_kv]),
            "ctx_v": jnp.stack([kv[1] for kv in ctx_kv]),
            "ctx_lens": lens + 1,
            "beam_k": jnp.zeros((L, B, H - 1, Wm, nH, dh), cfg.dtype),
            "beam_v": jnp.zeros((L, B, H - 1, Wm, nH, dh), cfg.dtype),
            "anc": jnp.zeros((B, H - 1, Wm), jnp.int32),
            # parent map for the NEXT step's ancestry re-root. Differs
            # from `parents` (the search tree used by decode_paths) after
            # a KV compaction, which moves survivor w's KV to slot w.
            "kv_parents": pad_w(state.parents[:, 0], 1),
        }

    def beam_step(
        self, carry, h: int, width_in: int, width_out: int,
        attn_backend: str = "auto", logits_processor=None,
    ):
        """One hierarchy step h (1..H-1) at beam width `width_in`,
        narrowing to `width_out` survivors (width schedule must be
        non-increasing — reference: gr_scheduler/beam_policy.py:126
        `scheduled`). On width change the beam KV is compacted to
        survivor order (reference: gr_runtime/beam_kv_compaction.py) so
        later steps run square at the new width. Carry arrays keep their
        padded Wm slots; dead slots hold -inf scores."""
        assert width_out <= width_in, "beam schedule must be non-increasing"
        cfg = self.config
        H = cfg.num_hierarchies
        L = cfg.num_layers
        Wm = carry["scores"].shape[1]
        W = width_in
        B = carry["scores"].shape[0]
        scores = carry["scores"][:, :W]
        tokens = carry["tokens"][:, :, :W]
        parents = carry["parents"][:, :, :W]
        anc = carry["anc"][:, :, :W]
        beam_k = carry["beam_k"][:, :, :, :W]
        beam_v = carry["beam_v"][:, :, :, :W]

        par = carry["kv_parents"][:, :W]
        A = anc
        if h > 1:
            A = A.at[:, : h - 1].set(
                jnp.take_along_axis(A[:, : h - 1], par[:, None, :], axis=2)
            )
        tok = tokens[:, h - 1, :]
        x = self._book(h - 1)(tok).astype(cfg.dtype)
        beam_inputs = [
            BeamAttnInputs(
                k_ctx=carry["ctx_k"][li], v_ctx=carry["ctx_v"][li],
                ctx_lens=carry["ctx_lens"],
                k_beam=beam_k[li][:, : h - 1] if h > 1 else None,
                v_beam=beam_v[li][:, : h - 1] if h > 1 else None,
                ancestry=A[:, : h - 1] if h > 1 else None,
                backend=attn_backend,
            )
            for li in range(L)
        ]
        hidden, new_kv = self.decoder(x, train=False, beam_attn=beam_inputs)
        for li in range(L):
            beam_k = beam_k.at[li, :, h - 1].set(new_kv[li][0])
            beam_v = beam_v.at[li, :, h - 1].set(new_kv[li][1])
        A = A.at[:, h - 1].set(
            jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None], (B, W))
        )
        logp = jax.nn.log_softmax(
            self._head(h)(hidden.astype(jnp.float32)), axis=-1
        )
        if logits_processor is not None:
            # decode each live beam's h-token prefix through the search
            # tree for prefix-conditioned processors (constraint tries)
            prefix = decode_paths(BeamState(
                scores=scores, tokens=tokens, parents=parents,
                step=jnp.asarray(h, jnp.int32),
            ))[:, :, :h]
            logp = logits_processor(h, logp, prefix)
        # propagate with top width_out over (W x C)
        C = logp.shape[-1]
        total = scores[:, :, None] + logp
        top_scores, top_idx = jax.lax.top_k(
            total.reshape(B, W * C), width_out
        )
        parent = (top_idx // C).astype(jnp.int32)
        token = (top_idx % C).astype(jnp.int32)
        if width_out < W:
            pad = W - width_out
            top_scores = jnp.pad(
                top_scores, ((0, 0), (0, pad)), constant_values=-jnp.inf
            )
            parent = jnp.pad(parent, ((0, 0), (0, pad)))
            token = jnp.pad(token, ((0, 0), (0, pad)))
        tokens = tokens.at[:, h, :].set(token)
        parents = parents.at[:, h, :].set(parent)
        scores = top_scores
        kv_parents = parent

        if width_out < W:
            # compact beam KV to survivor order: re-root ancestry through
            # the surviving parents, gather KV, reset ancestry to
            # identity. `parents` (the search tree) is untouched —
            # kv_parents becomes identity instead.
            A2 = jnp.take_along_axis(A, parent[:, None, :], axis=2)
            gather = A2[None, :, :, :, None, None]  # [1,B,H-1,W,1,1]
            beam_k = jnp.take_along_axis(
                beam_k, jnp.broadcast_to(gather, beam_k.shape), axis=3
            )
            beam_v = jnp.take_along_axis(
                beam_v, jnp.broadcast_to(gather, beam_v.shape), axis=3
            )
            A = jnp.broadcast_to(
                jnp.arange(W, dtype=jnp.int32)[None, None, :],
                (B, H - 1, W),
            )
            kv_parents = jnp.broadcast_to(
                jnp.arange(W, dtype=jnp.int32)[None, :], (B, W)
            )

        def unpad_w(dst, src, axis):
            idx = [slice(None)] * dst.ndim
            idx[axis] = slice(0, W)
            return dst.at[tuple(idx)].set(src)

        out = dict(carry)
        out["scores"] = unpad_w(carry["scores"], scores, 1)
        out["tokens"] = unpad_w(carry["tokens"], tokens, 2)
        out["parents"] = unpad_w(carry["parents"], parents, 2)
        out["anc"] = unpad_w(carry["anc"], A, 2)
        out["beam_k"] = unpad_w(carry["beam_k"], beam_k, 3)
        out["beam_v"] = unpad_w(carry["beam_v"], beam_v, 3)
        out["kv_parents"] = unpad_w(carry["kv_parents"], kv_parents, 1)
        return out

    def beam_finalize(self, carry, final_width: int):
        """Walk ancestry to decode full paths (reference:
        beam_search.py decode_paths). Returns (paths [B, W, H],
        scores [B, W]) at the final width."""
        W = final_width
        state = BeamState(
            scores=carry["scores"][:, :W],
            tokens=carry["tokens"][:, :, :W],
            parents=carry["parents"][:, :, :W],
            step=jnp.asarray(self.config.num_hierarchies, jnp.int32),
        )
        return decode_paths(state), state.scores
