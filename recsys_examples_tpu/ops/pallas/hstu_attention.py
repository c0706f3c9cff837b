"""Pallas TPU varlen HSTU (SiLU) attention — forward + backward.

TPU-native replacement for the reference CUTLASS/Triton HSTU attention
kernels (contract: corelib/hstu/hstu_attn/hstu_attn_interface.py:185
`hstu_attn_varlen_func`; semantics twin: examples/hstu/ops/pt_ops/
pt_hstu_attention.py:150).

Design (TPU-first, not a port):
  - Near-varlen "block-aligned jagged" layout: sequences are packed
    back-to-back with each sequence start rounded up to the tile size
    (<= tile-1 wasted rows per sequence, vs B*N-sum(n) for dense padding).
    TPU DMA requires tile-aligned base rows, so true unaligned varlen is
    not expressible; this layout keeps FLOPs ~ sum_i(n_i * extent_i) while
    satisfying Mosaic's alignment rules. The wrapper relayouts from the
    packed [T, H, D] jagged layout with one gather each way.
  - Grid (B, num_q_blocks): each instance owns one q tile across ALL heads
    (K/V DMA amortized over heads); an inner fori_loop streams K/V tiles
    with double buffering from HBM into VMEM scratch.
  - SiLU attention (no softmax -> no running max/denominator state):
        P = silu(q k^T * alpha) / scaling_seqlen * mask;  out = P v
  - Mask zoo evaluated on the VPU per (q-tile, k-tile): causal/non-causal,
    contextual collapse (position ids clamp to 0), target-group purge,
    local window (+ min_full tail), plus row/col < n guards.
  - Causal q tiles only visit K/V up to the diagonal (contextual rows force
    a full-extent visit for the first tiles); empty tiles are skipped.
  - fp32 accumulation; output dtype follows v.
  - Backward = two kernels (dq over q tiles; dk/dv over k tiles),
    recomputing scores on the fly — SiLU attention has no softmax stats,
    so recompute is cheap and no residual beyond q/k/v is needed.

rab/drab (relative attention bias + its gradient) are implemented by
`hstu_attn_varlen_rab` below. Quantized attention exists as an int8
per-tensor forward (`hstu_attn_varlen_quantized_calibrated`) — measured
conversion-bound on v5e, so it is NOT a perf feature; see README.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEF_BLOCK_Q = 128
DEF_BLOCK_K = 128
# Row granularity of per-sequence starts in the block-aligned jagged
# layout. 32 satisfies every dtype's sublane tiling (f32 8, bf16 16,
# int8 32) while wasting <= 31 rows per sequence — block size (BQ/BK)
# alignment is NOT required because tiles DMA from any 32-aligned row.
ATTN_ALIGN = 32


@jax.custom_vjp
def _relayout_gather(x2d, src, valid, inv_src, inv_valid):
    """Masked row gather whose VJP is the INVERSE masked gather (the map
    is a bijection on valid rows), avoiding the row-scatter transpose XLA
    would otherwise emit."""
    out = x2d[src]
    return jnp.where(valid[:, None], out, jnp.zeros((), x2d.dtype))


def _relayout_gather_fwd(x2d, src, valid, inv_src, inv_valid):
    return _relayout_gather(x2d, src, valid, inv_src, inv_valid), (
        inv_src, inv_valid,
    )


def _relayout_gather_bwd(res, g):
    inv_src, inv_valid = res
    gx = g[inv_src]
    gx = jnp.where(inv_valid[:, None], gx, jnp.zeros((), g.dtype))
    return gx, None, None, None, None


_relayout_gather.defvjp(_relayout_gather_fwd, _relayout_gather_bwd)


def attn_alignment(seq_offsets, packed_total, block_q=DEF_BLOCK_Q,
                   block_k=DEF_BLOCK_K):
    """Build the aligned-jagged relayout helper shared by the HSTU block
    (one to_aligned at block entry, one to_packed at exit) and the
    kernels (which derive the same layout from seq_offsets)."""
    return _Layout(
        seq_offsets, packed_total, ATTN_ALIGN,
        tail_pad=2 * max(block_q, block_k),
    )


def _silu_f32(x):
    return x * jax.nn.sigmoid(x)


def _dsilu_f32(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


def _cdiv(a, b):
    b = jnp.int32(b)
    return ((a.astype(jnp.int32) + b - jnp.int32(1)) // b)


def _compute_mask(
    row_pos, col_pos, n, c, t,
    *, causal, has_context, has_targets,
    target_group_size, max_attn_len, min_full_attn_seq_len,
):
    """[BQ, BK] fp32 validity mask (semantics of reference
    `_get_valid_attn_mask`, pt_hstu_attention.py:46, + in-sequence
    guards for the packed layout)."""
    one = jnp.int32(1)
    zero = jnp.int32(0)
    row_ids = jnp.maximum(row_pos - c + one, zero)
    col_ids = jnp.maximum(col_pos - c + one, zero)
    dist = row_ids - col_ids
    if not causal:
        dist = jnp.abs(dist)
    valid = jnp.logical_or(row_pos == col_pos, dist > zero)

    max_id = n - c + one
    hist_max_id = max_id
    if has_targets:
        g = jnp.int32(target_group_size)
        neg1 = jnp.int32(-1)
        tg_row = jnp.maximum(row_ids - max_id + t, neg1) // g
        tg_col = jnp.maximum(col_ids - max_id + t, neg1) // g
        ok = jnp.logical_or(
            tg_row == tg_col, jnp.logical_or(tg_row < 0, tg_col < 0)
        )
        valid = jnp.logical_and(valid, ok)
        hist_max_id = max_id - t

    if max_attn_len > 0:
        mal = jnp.int32(max_attn_len)
        if min_full_attn_seq_len > 0:
            valid = jnp.logical_and(
                valid,
                jnp.logical_or(
                    dist <= mal,
                    row_ids >= hist_max_id - jnp.int32(min_full_attn_seq_len),
                ),
            )
        else:
            valid = jnp.logical_and(valid, dist <= mal)

    if has_context:
        valid = jnp.logical_or(
            valid, jnp.logical_and(row_ids == 0, col_ids < hist_max_id)
        )

    valid = jnp.logical_and(valid, row_pos < n)
    valid = jnp.logical_and(valid, col_pos < n)
    return valid.astype(jnp.float32)


def _tile_fully_valid(q_lo, col0, n, t, BQ, BK, *, causal, max_attn_len,
                      has_targets):
    """Scalar predicate: this (BQ x BK) tile's mask is all-ones, so the
    kernel can skip the VPU mask evaluation (the mask math costs about as
    many VPU cycles as the tile's MXU MACs at BQ=BK=128 — for long
    sequences ~60-95% of visited tiles are such interior tiles).

    Holds when the tile sits strictly below the causal diagonal
    (min row >= max col), every row is inside the sequence, and every
    column is a history column (target columns need the target-group
    check; target ROWS over history columns are always valid). Context
    rows/columns need no exclusion: below the diagonal a context row
    attends all history columns via the row_ids==0 clause and a context
    column is reached by any later row (dist > 0 after the id clamp).
    Returns None (no fast path) for the mask families where full tiles
    cannot be certified this cheaply (non-causal, windowed max_attn_len).
    """
    if not causal or max_attn_len > 0:
        return None
    n_cols = n - t if has_targets else n
    return ((q_lo >= col0 + jnp.int32(BK - 1))
            & (q_lo + jnp.int32(BQ) <= n)
            & (col0 + jnp.int32(BK) <= n_cols))


def _kv_extent(q_lo, n, c, BQ, *, causal, has_context):
    """How far into K/V this q tile must look."""
    if not causal:
        return n
    causal_end = jnp.minimum(n, q_lo + jnp.int32(BQ))
    if has_context:
        return jnp.where(q_lo < c, n, causal_end)
    return causal_end


def _read_meta(meta_ref, b, B, has_context, has_targets):
    off = meta_ref[b]
    n = meta_ref[B + b]
    c = meta_ref[2 * B + b] if has_context else jnp.int32(0)
    t = meta_ref[3 * B + b] if has_targets else jnp.int32(0)
    return off, n, c, t


def _tile_meta(meta_ref, j, B, MAXT, block):
    """(aligned start row, seq index, tile index) of worklist entry j."""
    bj = meta_ref[4 * B + j]
    tj = meta_ref[4 * B + MAXT + j]
    return meta_ref[bj] + tj * jnp.int32(block), bj, tj


def _zero_tail(buf, slot, hbm, sem1, start, TAL, BLK, n_ch):
    """Zero HBM rows [start, TAL) with clamped BLK-row chunk writes.

    Chunk starts never drop below `start` (the layout's tail padding
    guarantees TAL - BLK >= start) and overlapping zero-on-zero writes are
    benign, so a fixed chunk size covers an arbitrary-length tail. Keeps
    aligned-mode consumers from ever reading uninitialized output rows."""
    buf[slot] = jnp.zeros_like(buf[slot])

    def body(c, _):
        raw = start + c * jnp.int32(BLK)
        st = pl.multiple_of(jnp.minimum(raw, jnp.int32(TAL - BLK)), 32)

        @pl.when(raw < jnp.int32(TAL))
        def _():
            d = pltpu.make_async_copy(
                buf.at[slot], hbm.at[pl.ds(st, BLK)], sem1
            )
            d.start()
            d.wait()

        return jnp.int32(0)

    jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(n_ch), body, jnp.int32(0), unroll=False
    )


def _fwd_kernel(
    meta_ref,
    q_hbm, k_hbm, v_hbm, rab_hbm,
    o_hbm,
    q_buf, k_buf, v_buf, rab_buf, o_buf, acc_ref,
    sem,
    *, B, H, D, V, BQ, BK, MAXT, TAL, NZ_CH, has_rab,
    alpha, inv_scaling, causal, has_context, has_targets,
    target_group_size, max_attn_len, min_full_attn_seq_len,
    quantized=False, v_scale=1.0,
):
    """Software-pipelined across the (sequential) worklist grid: step i
    prefetches step i+1's q tile and defers its own o write-back wait to
    step i+2 (sem layout: 0/1 q slots, 2/3 k, 4/5 v, 6 rab, 7/8 o)."""
    i = pl.program_id(0)
    nwork = meta_ref[4 * B + 2 * MAXT]
    alpha = jnp.float32(alpha)
    inv_scaling = jnp.float32(inv_scaling)

    def q_dma(j, slot):
        s, _, _ = _tile_meta(meta_ref, j, B, MAXT, BQ)
        s = pl.multiple_of(s, 32)
        return pltpu.make_async_copy(
            q_hbm.at[pl.ds(s, BQ)], q_buf.at[slot], sem.at[slot]
        )

    @pl.when(i < nwork)
    def _work():
        p = jax.lax.rem(i, jnp.int32(2))
        b = meta_ref[4 * B + i]
        qi = meta_ref[4 * B + MAXT + i]
        off, n, c, t = _read_meta(meta_ref, b, B, has_context, has_targets)
        q_lo = qi * jnp.int32(BQ)
        s = pl.multiple_of(off + q_lo, 32)

        @pl.when(i == 0)
        def _():
            q_dma(jnp.int32(0), jnp.int32(0)).start()

        @pl.when(i + 1 < nwork)
        def _():
            q_dma(i + 1, jnp.int32(1) - p).start()

        kv_end = _kv_extent(q_lo, n, c, BQ, causal=causal, has_context=has_context)
        num_kb = _cdiv(kv_end, BK)

        def kv_dma(slot, kj):
            ks = pl.multiple_of(off + kj * jnp.int32(BK), 32)
            return (
                pltpu.make_async_copy(
                    k_hbm.at[pl.ds(ks, BK)], k_buf.at[slot], sem.at[jnp.int32(2) + slot]
                ),
                pltpu.make_async_copy(
                    v_hbm.at[pl.ds(ks, BK)], v_buf.at[slot], sem.at[jnp.int32(4) + slot]
                ),
            )

        def rab_dma(kj):
            return pltpu.make_async_copy(
                rab_hbm.at[b, :, pl.ds(pl.multiple_of(q_lo, BQ), BQ),
                           pl.ds(pl.multiple_of(kj * jnp.int32(BK), BK), BK)],
                rab_buf, sem.at[jnp.int32(6)],
            )

        def kv0_dma(j):
            """First k/v block of worklist entry j's SEQUENCE (slot 0) —
            every tile prefetches the next tile's kv0 after its own kv
            loop, so no tile waits a cold first-block DMA."""
            bj = meta_ref[4 * B + j]
            ks = pl.multiple_of(meta_ref[bj], 32)
            return (
                pltpu.make_async_copy(
                    k_hbm.at[pl.ds(ks, BK)], k_buf.at[jnp.int32(0)],
                    sem.at[jnp.int32(2)],
                ),
                pltpu.make_async_copy(
                    v_hbm.at[pl.ds(ks, BK)], v_buf.at[jnp.int32(0)],
                    sem.at[jnp.int32(4)],
                ),
            )

        @pl.when(i == 0)
        def _():
            a0, b0 = kv0_dma(jnp.int32(0))
            a0.start()
            b0.start()

        if has_rab:
            r0 = rab_dma(jnp.int32(0))
            r0.start()

        acc_ref[:] = jnp.zeros_like(acc_ref)
        q_dma(i, p).wait()
        qf = q_buf[p]
        row_pos = q_lo + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 0)

        def body(kj, _):
            slot = jax.lax.rem(kj, jnp.asarray(2, jnp.asarray(kj).dtype))

            @pl.when(kj + 1 < num_kb)
            def _():
                a, bb = kv_dma(jax.lax.rem(kj + 1, jnp.asarray(2, (kj + 1).dtype)), kj + 1)
                a.start()
                bb.start()

            dkc, dvc = kv_dma(slot, kj)
            dkc.wait()
            dvc.wait()
            if has_rab:
                rab_dma(kj).wait()
                rab_tile = rab_buf[:].astype(jnp.float32)

            col0 = kj * jnp.int32(BK)

            def _slow_mask():
                col_pos = col0 + jax.lax.broadcasted_iota(
                    jnp.int32, (BQ, BK), 1)
                return _compute_mask(
                    row_pos, col_pos, n, c, t,
                    causal=causal, has_context=has_context,
                    has_targets=has_targets,
                    target_group_size=target_group_size,
                    max_attn_len=max_attn_len,
                    min_full_attn_seq_len=min_full_attn_seq_len,
                )

            full = _tile_fully_valid(
                q_lo, col0, n, t, BQ, BK, causal=causal,
                max_attn_len=max_attn_len, has_targets=has_targets,
            )
            if full is None:
                mask = _slow_mask()
            else:
                mask = jax.lax.cond(
                    full, lambda: jnp.ones((BQ, BK), jnp.float32),
                    _slow_mask,
                )
            kf = k_buf[slot]
            vf = v_buf[slot]
            qq = qf
            if quantized:
                # int8 path (reference: HSTU-3 FP8 quantization modes):
                # tensors travel HBM->VMEM as int8 (half the DMA traffic of
                # bf16 — attention here is DMA-bound) and dequantize on the
                # VPU; scales fold into alpha (scores) and v_scale (output).
                # This Mosaic build rejects direct i8 x i8 MXU matmuls, so
                # the MACs run bf16.
                qq = qf.astype(jnp.bfloat16)
                kf = kf.astype(jnp.bfloat16)
                vf = vf.astype(jnp.bfloat16)
            for h in range(H):
                sc = jax.lax.dot_general(
                    qq[:, h * D:(h + 1) * D], kf[:, h * D:(h + 1) * D],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.float32) * alpha
                if has_rab:
                    sc = sc + rab_tile[h]
                p_attn = _silu_f32(sc) * inv_scaling * mask
                acc_ref[:, h * V:(h + 1) * V] += jax.lax.dot_general(
                    p_attn.astype(vf.dtype), vf[:, h * V:(h + 1) * V],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            if has_rab:
                @pl.when(kj + 1 < num_kb)
                def _():
                    rab_dma(kj + 1).start()
            return jnp.int32(0)

        jax.lax.fori_loop(jnp.int32(0), num_kb, body, jnp.int32(0), unroll=False)

        @pl.when(i + 1 < nwork)
        def _():
            a1, b1 = kv0_dma(i + 1)
            a1.start()
            b1.start()

        def o_dma(j, slot):
            sj, _, _ = _tile_meta(meta_ref, j, B, MAXT, BQ)
            sj = pl.multiple_of(sj, 32)
            return pltpu.make_async_copy(
                o_buf.at[slot], o_hbm.at[pl.ds(sj, BQ)],
                sem.at[jnp.int32(7) + slot],
            )

        if quantized:
            o_buf[p] = (acc_ref[:] * jnp.float32(v_scale)).astype(o_buf.dtype)
        else:
            o_buf[p] = acc_ref[:].astype(o_buf.dtype)

        # With 32-row sequence alignment a tile's BQ-row write can overrun
        # into the next sequence's rows (rewritten correctly by its own
        # first tile later). Writes must therefore land in worklist order:
        # wait step i-1's write (latency already hidden behind this step's
        # compute) before starting our own.
        @pl.when(i >= 1)
        def _():
            o_dma(i - 1, jnp.int32(1) - p).wait()

        o_dma(i, p).start()

        @pl.when(i == nwork - 1)
        def _():
            o_dma(i, p).wait()
            # zero the tail rows past the final write so aligned-mode
            # consumers never read uninitialized memory
            _zero_tail(
                o_buf, jnp.int32(1) - p, o_hbm, sem.at[jnp.int32(7)],
                s + jnp.int32(BQ), TAL, BQ, NZ_CH,
            )


def _bwd_dq_kernel(
    meta_ref,
    q_hbm, k_hbm, v_hbm, do_hbm, rab_hbm,
    dq_hbm, drab_hbm,
    q_buf, do_buf, k_buf, v_buf, rab_buf, drab_buf, dq_buf, acc_ref,
    sem,
    *, B, H, D, V, BQ, BK, MAXT, TAL, NZ_CH, has_rab,
    alpha, inv_scaling, causal, has_context, has_targets,
    target_group_size, max_attn_len, min_full_attn_seq_len,
):
    """dq over the compacted q-tile worklist, software-pipelined like
    _fwd_kernel (sem layout: 0/1 q, 2/3 do, 4/5 k, 6/7 v, 8 rab, 9 drab,
    10/11 dq write-back)."""
    i = pl.program_id(0)
    nwork = meta_ref[4 * B + 2 * MAXT]
    alpha = jnp.float32(alpha)
    inv_scaling = jnp.float32(inv_scaling)

    def in_dma(j, slot):
        sj, _, _ = _tile_meta(meta_ref, j, B, MAXT, BQ)
        sj = pl.multiple_of(sj, 32)
        return (
            pltpu.make_async_copy(
                q_hbm.at[pl.ds(sj, BQ)], q_buf.at[slot], sem.at[slot]
            ),
            pltpu.make_async_copy(
                do_hbm.at[pl.ds(sj, BQ)], do_buf.at[slot],
                sem.at[jnp.int32(2) + slot]
            ),
        )

    @pl.when(i < nwork)
    def _work():
        p = jax.lax.rem(i, jnp.int32(2))
        b = meta_ref[4 * B + i]
        qi = meta_ref[4 * B + MAXT + i]
        off, n, c, t = _read_meta(meta_ref, b, B, has_context, has_targets)
        q_lo = qi * jnp.int32(BQ)
        s = pl.multiple_of(off + q_lo, 32)

        @pl.when(i == 0)
        def _():
            a, bb = in_dma(jnp.int32(0), jnp.int32(0))
            a.start()
            bb.start()

        @pl.when(i + 1 < nwork)
        def _():
            a, bb = in_dma(i + 1, jnp.int32(1) - p)
            a.start()
            bb.start()

        kv_end = _kv_extent(q_lo, n, c, BQ, causal=causal, has_context=has_context)
        num_kb = _cdiv(kv_end, BK)

        def kv_dma(slot, kj):
            ks = pl.multiple_of(off + kj * jnp.int32(BK), 32)
            return (
                pltpu.make_async_copy(
                    k_hbm.at[pl.ds(ks, BK)], k_buf.at[slot], sem.at[jnp.int32(4) + slot]
                ),
                pltpu.make_async_copy(
                    v_hbm.at[pl.ds(ks, BK)], v_buf.at[slot], sem.at[jnp.int32(6) + slot]
                ),
            )

        def rab_rd(kj):
            return pltpu.make_async_copy(
                rab_hbm.at[b, :, pl.ds(pl.multiple_of(q_lo, BQ), BQ),
                           pl.ds(pl.multiple_of(kj * jnp.int32(BK), BK), BK)],
                rab_buf, sem.at[jnp.int32(8)],
            )

        def drab_wr(kj):
            return pltpu.make_async_copy(
                drab_buf,
                drab_hbm.at[b, :, pl.ds(pl.multiple_of(q_lo, BQ), BQ),
                            pl.ds(pl.multiple_of(kj * jnp.int32(BK), BK), BK)],
                sem.at[jnp.int32(9)],
            )

        def kv0_dma(j):
            bj = meta_ref[4 * B + j]
            ks = pl.multiple_of(meta_ref[bj], 32)
            return (
                pltpu.make_async_copy(
                    k_hbm.at[pl.ds(ks, BK)], k_buf.at[jnp.int32(0)],
                    sem.at[jnp.int32(4)],
                ),
                pltpu.make_async_copy(
                    v_hbm.at[pl.ds(ks, BK)], v_buf.at[jnp.int32(0)],
                    sem.at[jnp.int32(6)],
                ),
            )

        @pl.when(i == 0)
        def _():
            a0, b0 = kv0_dma(jnp.int32(0))
            a0.start()
            b0.start()

        if has_rab:
            rab_rd(jnp.int32(0)).start()
        acc_ref[:] = jnp.zeros_like(acc_ref)
        d1, d2 = in_dma(i, p)
        d1.wait()
        d2.wait()
        # tiles stay in their storage dtype (bf16) for every MXU dot —
        # f32 x f32 matmuls run at a fraction of the bf16 MXU rate; only
        # the elementwise score math is f32
        qf = q_buf[p]
        dof = do_buf[p]
        row_pos = q_lo + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 0)

        def body(kj, _):
            slot = jax.lax.rem(kj, jnp.asarray(2, jnp.asarray(kj).dtype))

            @pl.when(kj + 1 < num_kb)
            def _():
                a, bb = kv_dma(jax.lax.rem(kj + 1, jnp.asarray(2, (kj + 1).dtype)), kj + 1)
                a.start()
                bb.start()

            dkc, dvc = kv_dma(slot, kj)
            dkc.wait()
            dvc.wait()
            if has_rab:
                rab_rd(kj).wait()
                rab_tile = rab_buf[:].astype(jnp.float32)
            col0 = kj * jnp.int32(BK)

            def _slow_mask():
                col_pos = col0 + jax.lax.broadcasted_iota(
                    jnp.int32, (BQ, BK), 1)
                return _compute_mask(
                    row_pos, col_pos, n, c, t,
                    causal=causal, has_context=has_context,
                    has_targets=has_targets,
                    target_group_size=target_group_size,
                    max_attn_len=max_attn_len,
                    min_full_attn_seq_len=min_full_attn_seq_len,
                )

            full = _tile_fully_valid(
                q_lo, col0, n, t, BQ, BK, causal=causal,
                max_attn_len=max_attn_len, has_targets=has_targets,
            )
            if full is None:
                mask = _slow_mask()
            else:
                mask = jax.lax.cond(
                    full, lambda: jnp.ones((BQ, BK), jnp.float32),
                    _slow_mask,
                )
            kf = k_buf[slot]
            vf = v_buf[slot]
            for h in range(H):
                hd = slice(h * D, (h + 1) * D)
                hv = slice(h * V, (h + 1) * V)
                sc = jax.lax.dot_general(
                    qf[:, hd], kf[:, hd],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.float32) * alpha
                if has_rab:
                    sc = sc + rab_tile[h]
                dp = jax.lax.dot_general(
                    dof[:, hv], vf[:, hv],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.float32)
                # d(arg)/d(rab) = 1, d(arg)/d(q k) chain has the extra alpha
                ds_rab = dp * _dsilu_f32(sc) * inv_scaling * mask
                ds = ds_rab * alpha
                if has_rab:
                    drab_buf[h] = ds_rab.astype(drab_buf.dtype)
                acc_ref[:, hd] += jax.lax.dot_general(
                    ds.astype(kf.dtype), kf[:, hd],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            if has_rab:
                w = drab_wr(kj)
                w.start()
                w.wait()

                @pl.when(kj + 1 < num_kb)
                def _():
                    rab_rd(kj + 1).start()
            return jnp.int32(0)

        jax.lax.fori_loop(jnp.int32(0), num_kb, body, jnp.int32(0), unroll=False)
        # drab tiles this strip never visited stay zero via the pre-zeroed
        # aliased output (io_alias in _hstu_bwd_impl) — no zero-fill loop.

        @pl.when(i + 1 < nwork)
        def _():
            a1, b1 = kv0_dma(i + 1)
            a1.start()
            b1.start()

        def dq_dma(j, slot):
            sj, _, _ = _tile_meta(meta_ref, j, B, MAXT, BQ)
            sj = pl.multiple_of(sj, 32)
            return pltpu.make_async_copy(
                dq_buf.at[slot], dq_hbm.at[pl.ds(sj, BQ)],
                sem.at[jnp.int32(10) + slot],
            )

        dq_buf[p] = acc_ref[:].astype(dq_buf.dtype)

        # ordered writes: see _fwd_kernel (32-aligned tiles can overrun
        # into the next sequence's rows)
        @pl.when(i >= 1)
        def _():
            dq_dma(i - 1, jnp.int32(1) - p).wait()

        dq_dma(i, p).start()

        @pl.when(i == nwork - 1)
        def _():
            dq_dma(i, p).wait()
            _zero_tail(
                dq_buf, jnp.int32(1) - p, dq_hbm, sem.at[jnp.int32(10)],
                s + jnp.int32(BQ), TAL, BQ, NZ_CH,
            )



def _bwd_dkv_kernel(
    meta_ref,
    q_hbm, k_hbm, v_hbm, do_hbm, rab_hbm,
    dk_hbm, dv_hbm,
    k_buf, v_buf, q_buf, do_buf, rab_buf, dk_buf, dv_buf, acck_ref, accv_ref,
    sem,
    *, B, H, D, V, BQ, BK, MAXT, TAL, NZ_CH, has_rab,
    alpha, inv_scaling, causal, has_context, has_targets,
    target_group_size, max_attn_len, min_full_attn_seq_len,
):
    """dk/dv over the compacted k-tile worklist (meta built with
    block_size=BK), software-pipelined: step i prefetches step i+1's k/v
    strip and defers its dk/dv write-back waits (sem layout: 0/1 k, 2/3 v,
    4/5 q, 6/7 do, 8 rab, 9/10 dk, 11/12 dv)."""
    i = pl.program_id(0)
    nwork = meta_ref[4 * B + 2 * MAXT]
    alpha = jnp.float32(alpha)
    inv_scaling = jnp.float32(inv_scaling)

    def in_dma(j, slot):
        sj, _, _ = _tile_meta(meta_ref, j, B, MAXT, BK)
        sj = pl.multiple_of(sj, 32)
        return (
            pltpu.make_async_copy(
                k_hbm.at[pl.ds(sj, BK)], k_buf.at[slot], sem.at[slot]
            ),
            pltpu.make_async_copy(
                v_hbm.at[pl.ds(sj, BK)], v_buf.at[slot],
                sem.at[jnp.int32(2) + slot]
            ),
        )

    @pl.when(i < nwork)
    def _work():
        p = jax.lax.rem(i, jnp.int32(2))
        b = meta_ref[4 * B + i]
        ki = meta_ref[4 * B + MAXT + i]
        off, n, c, t = _read_meta(meta_ref, b, B, has_context, has_targets)
        k_lo = ki * jnp.int32(BK)
        s = pl.multiple_of(off + k_lo, 32)

        @pl.when(i == 0)
        def _():
            a, bb = in_dma(jnp.int32(0), jnp.int32(0))
            a.start()
            bb.start()

        @pl.when(i + 1 < nwork)
        def _():
            a, bb = in_dma(i + 1, jnp.int32(1) - p)
            a.start()
            bb.start()

        # q strips this k tile must see: the causal range [k_lo//BQ, ...)
        # plus — when the batch has contextual rows — strip 0 (contextual
        # rows sit in the first strip and attend everywhere). Visiting
        # {0} + causal range instead of everything from 0 halves the work
        # for long sequences.
        if causal:
            q_base_blk = k_lo // jnp.int32(BQ)
        else:
            q_base_blk = jnp.int32(0)
        num_qb = _cdiv(n, BQ)
        if causal and has_context:
            extra0 = jnp.where(q_base_blk > 0, jnp.int32(1), jnp.int32(0))
        else:
            extra0 = jnp.int32(0)

        def strip_of(idx):
            """idx -> q strip index (strip 0 first when extra0)."""
            return jnp.where(
                idx < extra0, jnp.int32(0), q_base_blk + idx - extra0
            )
        q_start_blk = strip_of(jnp.int32(0))

        def q_dma(slot, qj):
            qs = pl.multiple_of(off + qj * jnp.int32(BQ), 32)
            return (
                pltpu.make_async_copy(
                    q_hbm.at[pl.ds(qs, BQ)], q_buf.at[slot], sem.at[jnp.int32(4) + slot]
                ),
                pltpu.make_async_copy(
                    do_hbm.at[pl.ds(qs, BQ)], do_buf.at[slot], sem.at[jnp.int32(6) + slot]
                ),
            )

        def rab_rd(qj):
            return pltpu.make_async_copy(
                rab_hbm.at[b, :,
                           pl.ds(pl.multiple_of(qj * jnp.int32(BQ), BQ), BQ),
                           pl.ds(pl.multiple_of(k_lo, BK), BK)],
                rab_buf, sem.at[jnp.int32(8)],
            )

        def q0_dma(j):
            """First q/do strip of worklist entry j (slot 0) — prefetched
            by the previous grid step, mirroring kv0_dma in the forward."""
            sj, bj, tj = _tile_meta(meta_ref, j, B, MAXT, BK)
            offj = meta_ref[bj]
            if causal and not has_context:
                qsb = (tj * jnp.int32(BK)) // jnp.int32(BQ)
            else:
                qsb = jnp.int32(0)
            qs = pl.multiple_of(offj + qsb * jnp.int32(BQ), 32)
            return (
                pltpu.make_async_copy(
                    q_hbm.at[pl.ds(qs, BQ)], q_buf.at[jnp.int32(0)],
                    sem.at[jnp.int32(4)],
                ),
                pltpu.make_async_copy(
                    do_hbm.at[pl.ds(qs, BQ)], do_buf.at[jnp.int32(0)],
                    sem.at[jnp.int32(6)],
                ),
            )

        @pl.when(i == 0)
        def _():
            a0, b0 = q0_dma(jnp.int32(0))
            a0.start()
            b0.start()

        if has_rab:
            rab_rd(q_start_blk).start()
        acck_ref[:] = jnp.zeros_like(acck_ref)
        accv_ref[:] = jnp.zeros_like(accv_ref)
        d1, d2 = in_dma(i, p)
        d1.wait()
        d2.wait()
        # bf16 tiles for the MXU; f32 elementwise only (see dq kernel)
        kf = k_buf[p]
        vf = v_buf[p]
        col_pos = k_lo + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1)

        nsteps = (num_qb - q_base_blk + extra0).astype(jnp.int32)

        def body(idx, _):
            qj = strip_of(idx)
            slot = jax.lax.rem(idx, jnp.asarray(2, idx.dtype))

            @pl.when(idx + 1 < nsteps)
            def _():
                a, bb = q_dma(jax.lax.rem(idx + 1, jnp.asarray(2, (idx + 1).dtype)), strip_of(idx + 1))
                a.start()
                bb.start()

            ac, bc = q_dma(slot, qj)
            ac.wait()
            bc.wait()
            if has_rab:
                rab_rd(qj).wait()
                rab_tile = rab_buf[:].astype(jnp.float32)
            def _slow_mask():
                row_pos = qj * jnp.int32(BQ) + jax.lax.broadcasted_iota(
                    jnp.int32, (BQ, BK), 0)
                return _compute_mask(
                    row_pos, col_pos, n, c, t,
                    causal=causal, has_context=has_context,
                    has_targets=has_targets,
                    target_group_size=target_group_size,
                    max_attn_len=max_attn_len,
                    min_full_attn_seq_len=min_full_attn_seq_len,
                )

            full = _tile_fully_valid(
                qj * jnp.int32(BQ), k_lo, n, t, BQ, BK, causal=causal,
                max_attn_len=max_attn_len, has_targets=has_targets,
            )
            if full is None:
                mask = _slow_mask()
            else:
                mask = jax.lax.cond(
                    full, lambda: jnp.ones((BQ, BK), jnp.float32),
                    _slow_mask,
                )
            qf = q_buf[slot]
            dof = do_buf[slot]
            for h in range(H):
                hd = slice(h * D, (h + 1) * D)
                hv = slice(h * V, (h + 1) * V)
                sc = jax.lax.dot_general(
                    qf[:, hd], kf[:, hd],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.float32) * alpha
                if has_rab:
                    sc = sc + rab_tile[h]
                p = _silu_f32(sc) * inv_scaling * mask
                accv_ref[:, hv] += jax.lax.dot_general(
                    p.astype(dof.dtype), dof[:, hv],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dp = jax.lax.dot_general(
                    dof[:, hv], vf[:, hv],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.float32)
                ds = dp * _dsilu_f32(sc) * (inv_scaling * alpha) * mask
                acck_ref[:, hd] += jax.lax.dot_general(
                    ds.astype(qf.dtype), qf[:, hd],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            if has_rab:
                @pl.when(idx + 1 < nsteps)
                def _():
                    rab_rd(strip_of(idx + 1)).start()
            return jnp.int32(0)

        jax.lax.fori_loop(jnp.int32(0), nsteps, body, jnp.int32(0), unroll=False)

        @pl.when(i + 1 < nwork)
        def _():
            a1, b1 = q0_dma(i + 1)
            a1.start()
            b1.start()

        def out_dma(j, slot):
            sj, _, _ = _tile_meta(meta_ref, j, B, MAXT, BK)
            sj = pl.multiple_of(sj, 32)
            return (
                pltpu.make_async_copy(
                    dk_buf.at[slot], dk_hbm.at[pl.ds(sj, BK)],
                    sem.at[jnp.int32(9) + slot],
                ),
                pltpu.make_async_copy(
                    dv_buf.at[slot], dv_hbm.at[pl.ds(sj, BK)],
                    sem.at[jnp.int32(11) + slot],
                ),
            )

        dk_buf[p] = acck_ref[:].astype(dk_buf.dtype)
        dv_buf[p] = accv_ref[:].astype(dv_buf.dtype)

        # ordered writes: see _fwd_kernel (32-aligned tiles can overrun
        # into the next sequence's rows)
        @pl.when(i >= 1)
        def _():
            w1p, w2p = out_dma(i - 1, jnp.int32(1) - p)
            w1p.wait()
            w2p.wait()

        w1, w2 = out_dma(i, p)
        w1.start()
        w2.start()

        @pl.when(i == nwork - 1)
        def _():
            w1l, w2l = out_dma(i, p)
            w1l.wait()
            w2l.wait()
            _zero_tail(
                dk_buf, jnp.int32(1) - p, dk_hbm, sem.at[jnp.int32(9)],
                s + jnp.int32(BK), TAL, BK, NZ_CH,
            )
            _zero_tail(
                dv_buf, jnp.int32(1) - p, dv_hbm, sem.at[jnp.int32(11)],
                s + jnp.int32(BK), TAL, BK, NZ_CH,
            )


# ------------------------------------------------------------------ wrapper


class _Layout:
    """Packed [T] <-> block-aligned [T_al] jagged layouts.

    Aligned layout: sequence b occupies rows
    [aligned_offsets[b], aligned_offsets[b] + len_b) where
    aligned_offsets[b] is a multiple of `align`. Static capacity
    T_al = T + B * align.
    """

    def __init__(self, seq_offsets, T, align, tail_pad: int = 0):
        """align: row granularity of per-sequence starts (a sublane
        multiple, decoupled from the kernel block sizes — tiles DMA from
        any 32-row-aligned start). tail_pad: extra buffer rows so a
        BQ/BK-row DMA starting near the end never runs past the buffer."""
        self.T = T
        self.align = align
        B = seq_offsets.shape[0] - 1
        # rounded to 32 so clamped tail-zero DMA chunks stay aligned
        self.T_al = -(-(T + B * align + tail_pad) // 32) * 32
        lengths = (seq_offsets[1:] - seq_offsets[:-1]).astype(jnp.int32)
        self.lengths = lengths
        aligned_len = ((lengths + align - 1) // align) * align
        self.aligned_offsets = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(aligned_len)]
        )
        self.seq_offsets = seq_offsets.astype(jnp.int32)
        self._B = B

    def _r2b(self, offs, total):
        tt = jnp.arange(total, dtype=jnp.int32)
        bb = jnp.searchsorted(offs, tt, side="right") - 1
        return jnp.clip(bb, 0, self._B - 1)

    def _conversion_maps(self):
        """Gather maps for packed <-> aligned relayout. Computed per call
        (NOT cached on self: a cache would leak tracers between the
        separately-traced custom_vjp fwd/bwd closures; XLA CSEs the
        duplicate index math within one trace anyway). Kernel-only users
        (aligned-mode calls) never call this."""
        T = self.T
        # aligned row -> packed source row (+ validity)
        b_al = self._r2b(self.aligned_offsets, self.T_al)
        pos_al = (
            jnp.arange(self.T_al, dtype=jnp.int32)
            - self.aligned_offsets[b_al]
        )
        to_al_src = jnp.clip(self.seq_offsets[b_al] + pos_al, 0, T - 1)
        to_al_valid = pos_al < self.lengths[b_al]
        # packed row -> aligned source row (+ validity)
        b_p = self._r2b(self.seq_offsets, T)
        pos_p = jnp.arange(T, dtype=jnp.int32) - self.seq_offsets[b_p]
        to_p_src = jnp.clip(
            self.aligned_offsets[b_p] + pos_p, 0, self.T_al - 1
        )
        to_p_valid = (
            jnp.arange(T, dtype=jnp.int32) < self.seq_offsets[-1]
        )
        return (to_al_src, to_al_valid, to_p_src, to_p_valid)

    @property
    def valid_rows(self):
        """[T_al] bool: rows holding real tokens in the aligned layout."""
        return self._conversion_maps()[1]

    def to_aligned(self, x2d):
        to_al_src, to_al_valid, _, _ = self._conversion_maps()
        out = x2d[to_al_src]
        return jnp.where(
            to_al_valid[:, None], out, jnp.zeros((), x2d.dtype)
        )

    def to_packed(self, x2d_al):
        _, _, to_p_src, to_p_valid = self._conversion_maps()
        out = x2d_al[to_p_src]
        return jnp.where(
            to_p_valid[:, None], out, jnp.zeros((), x2d_al.dtype)
        )

    # Differentiable relayouts with gather-based VJPs. The relayout is a
    # bijection on valid rows (padding rows are constant zeros), so the
    # transpose of each gather is the INVERSE gather — without these, the
    # autodiff transpose is a row scatter, which serializes on the TPU
    # scalar core and costs more than the whole attention kernel.
    def to_aligned_d(self, x2d):
        return _relayout_gather(x2d, *self._conversion_maps())

    def to_packed_d(self, x2d_al):
        src, valid, isrc, ivalid = self._conversion_maps()
        return _relayout_gather(x2d_al, isrc, ivalid, src, valid)

    def meta(self, num_contextuals, num_targets, block_size, max_tiles):
        """Scalar-prefetch payload: per-seq metadata plus a compacted tile
        WORKLIST so the kernel grid only visits real (seq, tile) pairs —
        with Zipf-skewed jagged batches a dense (B, N/bs) grid is mostly
        empty instances whose fixed overhead dominates the kernel."""
        B = self.lengths.shape[0]
        z = jnp.zeros((B,), jnp.int32)
        counts = (self.lengths + block_size - 1) // block_size
        offs = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)]
        )
        slot = jnp.arange(max_tiles, dtype=jnp.int32)
        bb = jnp.clip(
            jnp.searchsorted(offs, slot, side="right") - 1, 0, B - 1
        ).astype(jnp.int32)
        ti = slot - offs[bb]  # >= counts[b] for out-of-range slots
        return jnp.concatenate([
            self.aligned_offsets[:-1],
            self.lengths,
            z if num_contextuals is None else num_contextuals.astype(jnp.int32),
            z if num_targets is None else num_targets.astype(jnp.int32),
            bb,
            ti,
            offs[-1:],  # nwork: count of real tiles (valid entries are a
                        # contiguous prefix — the cross-step software
                        # pipeline in the kernels relies on this)
        ])

    def num_tiles(self, block_size: int) -> int:
        """Static worklist capacity: sum ceil(n_i/bs) <= T/bs + B."""
        B = self.lengths.shape[0]
        return self.T // block_size + B

def _pad_head_dim(x, T, H, D, Dp):
    """[T, H, D] -> [T, H*Dp] with zero-padded per-head columns (Mosaic
    lane slices must be 128-aligned; zero K/Q columns add zero scores and
    padded V columns are sliced away)."""
    if Dp == D:
        return x.reshape(T, H * D)
    return jnp.pad(x, ((0, 0), (0, 0), (0, Dp - D))).reshape(T, H * Dp)


def _unpad_head_dim(x2d, T, H, D, Dp):
    if Dp == D:
        return x2d.reshape(T, H, D)
    return x2d.reshape(T, H, Dp)[:, :, :D]


def _pad_rab(rab, B, H, NQP, NKP):
    """Pad dense rab [B|1, H|1, N, N] to the kernel's tiled extents and
    broadcast singleton batch/head dims."""
    rab = jnp.broadcast_to(
        rab, (B, H) + rab.shape[2:]
    )
    pq = NQP - rab.shape[2]
    pk = NKP - rab.shape[3]
    if pq or pk:
        rab = jnp.pad(rab, ((0, 0), (0, 0), (0, pq), (0, pk)))
    return rab


def _hstu_fwd_impl(
    q, k, v, rab, aux, max_seqlen, alpha, scaling_seqlen, causal,
    target_group_size, max_attn_len, min_full_attn_seq_len,
    block_q, block_k, interpret, return_aligned=False,
    quantized=False, v_scale=1.0, out_dtype=None,
    input_aligned=False, packed_total=0,
):
    """input_aligned: q/k/v are already in the kernel's block-aligned
    jagged layout ([T_al, H, D], built by `attn_alignment().to_aligned`)
    and the output stays aligned — lets the HSTU block run its whole layer
    stack in aligned layout with ONE relayout at block entry/exit instead
    of six gathers per layer. packed_total = packed T (static) in that
    case."""
    seq_offsets, num_contextuals, num_targets = aux
    Tin, H, D0 = q.shape
    V0 = v.shape[2]
    D = -(-D0 // 128) * 128
    V = -(-V0 // 128) * 128
    B = seq_offsets.shape[0] - 1
    if scaling_seqlen == -1:
        scaling_seqlen = max_seqlen
    BQ, BK = block_q, block_k
    NQ = pl.cdiv(max_seqlen, BQ)
    NK = pl.cdiv(max_seqlen, BK)
    T = packed_total if input_aligned else Tin
    lay = _Layout(seq_offsets, T, ATTN_ALIGN, tail_pad=2 * max(BQ, BK))
    MAXT = lay.num_tiles(BQ)
    meta = lay.meta(num_contextuals, num_targets, BQ, MAXT)
    if input_aligned:
        assert Tin == lay.T_al, (Tin, lay.T_al)
        qa = _pad_head_dim(q, Tin, H, D0, D)
        ka = _pad_head_dim(k, Tin, H, D0, D)
        va = _pad_head_dim(v, Tin, H, V0, V)
    else:
        qa = lay.to_aligned(_pad_head_dim(q, T, H, D0, D))
        ka = lay.to_aligned(_pad_head_dim(k, T, H, D0, D))
        va = lay.to_aligned(_pad_head_dim(v, T, H, V0, V))
    has_rab = rab is not None

    NZ_CH = -(-(B * ATTN_ALIGN + 2 * max(BQ, BK) + 32) // BQ) + 1
    kernel = functools.partial(
        _fwd_kernel,
        B=B, H=H, D=D, V=V, BQ=BQ, BK=BK, MAXT=MAXT,
        TAL=lay.T_al, NZ_CH=NZ_CH, has_rab=has_rab,
        quantized=quantized, v_scale=v_scale,
        alpha=float(alpha), inv_scaling=1.0 / float(scaling_seqlen),
        causal=causal,
        has_context=num_contextuals is not None,
        has_targets=num_targets is not None,
        target_group_size=target_group_size,
        max_attn_len=max_attn_len,
        min_full_attn_seq_len=min_full_attn_seq_len,
    )
    ins = [meta, qa, ka, va]
    scratch = [
        pltpu.VMEM((2, BQ, H * D), q.dtype),
        pltpu.VMEM((2, BK, H * D), k.dtype),
        pltpu.VMEM((2, BK, H * V), v.dtype),
    ]
    if has_rab:
        raba = _pad_rab(rab, B, H, NQ * BQ, NK * BK)
        ins.append(raba)
        scratch.append(pltpu.VMEM((H, BQ, BK), raba.dtype))
        body = kernel
        n_in = 4
    else:
        scratch.append(pltpu.VMEM((8, 128), q.dtype))  # unused slot

        def body(meta_ref, q_hbm, k_hbm, v_hbm, o_hbm,
                 q_buf, k_buf, v_buf, _unused, o_buf, acc_ref, sem):
            kernel(meta_ref, q_hbm, k_hbm, v_hbm, None, o_hbm,
                   q_buf, k_buf, v_buf, None, o_buf, acc_ref, sem)

        n_in = 3
    scratch += [
        pltpu.VMEM(
            (2, BQ, H * V), out_dtype if out_dtype is not None else v.dtype
        ),
        pltpu.VMEM((BQ, H * V), jnp.float32),
        pltpu.SemaphoreType.DMA((9,)),
    ]
    out = pl.pallas_call(
        body,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(MAXT,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * n_in,
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (lay.T_al, H * V), out_dtype if out_dtype is not None else v.dtype
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*ins)
    if input_aligned:
        # rows the tiles never write are zeroed in-kernel (_zero_tail)
        res = _unpad_head_dim(out, lay.T_al, H, V0, V)
    else:
        res = _unpad_head_dim(lay.to_packed(out), T, H, V0, V)
    if return_aligned:
        # hand the aligned q/k/v buffers to the custom_vjp so the backward
        # pass skips re-gathering them into the block-aligned layout
        return res, (qa, ka, va)
    return res


def _hstu_bwd_impl(
    q, k, v, rab, aux, g,
    max_seqlen, alpha, scaling_seqlen, causal, target_group_size,
    max_attn_len, min_full_attn_seq_len, block_q, block_k, interpret,
    aligned=None, input_aligned=False, packed_total=0,
):
    seq_offsets, num_contextuals, num_targets = aux
    Tin, H, D0 = q.shape
    V0 = v.shape[2]
    D = -(-D0 // 128) * 128
    V = -(-V0 // 128) * 128
    B = seq_offsets.shape[0] - 1
    if scaling_seqlen == -1:
        scaling_seqlen = max_seqlen
    BQ, BK = block_q, block_k
    T = packed_total if input_aligned else Tin
    lay = _Layout(seq_offsets, T, ATTN_ALIGN, tail_pad=2 * max(BQ, BK))
    MAXT_Q = lay.num_tiles(BQ)
    MAXT_K = lay.num_tiles(BK)
    meta_q = lay.meta(num_contextuals, num_targets, BQ, MAXT_Q)
    meta_k = (
        meta_q if BK == BQ
        else lay.meta(num_contextuals, num_targets, BK, MAXT_K)
    )
    if aligned is not None:
        qa, ka, va = aligned
    elif input_aligned:
        qa = _pad_head_dim(q, Tin, H, D0, D)
        ka = _pad_head_dim(k, Tin, H, D0, D)
        va = _pad_head_dim(v, Tin, H, V0, V)
    else:
        qa = lay.to_aligned(_pad_head_dim(q, T, H, D0, D))
        ka = lay.to_aligned(_pad_head_dim(k, T, H, D0, D))
        va = lay.to_aligned(_pad_head_dim(v, T, H, V0, V))
    if input_aligned:
        ga = _pad_head_dim(g.astype(v.dtype), lay.T_al, H, V0, V)
    else:
        ga = lay.to_aligned(_pad_head_dim(g.astype(v.dtype), T, H, V0, V))
    has_rab = rab is not None
    NQ = pl.cdiv(max_seqlen, BQ)
    NK = pl.cdiv(max_seqlen, BK)
    common = dict(
        B=B, H=H, D=D, V=V, BQ=BQ, BK=BK, TAL=lay.T_al,
        alpha=float(alpha), inv_scaling=1.0 / float(scaling_seqlen),
        causal=causal,
        has_context=num_contextuals is not None,
        has_targets=num_targets is not None,
        target_group_size=target_group_size,
        max_attn_len=max_attn_len,
        min_full_attn_seq_len=min_full_attn_seq_len,
    )
    raba = None
    if has_rab:
        raba = _pad_rab(rab, B, H, NQ * BQ, NK * BK)

    # ---- dq (+ drab)
    dq_kernel = functools.partial(
        _bwd_dq_kernel, MAXT=MAXT_Q, has_rab=has_rab,
        NZ_CH=-(-(B * ATTN_ALIGN + 2 * max(BQ, BK) + 32) // BQ) + 1,
        **common
    )
    ins = [meta_q, qa, ka, va, ga]
    scratch = [
        pltpu.VMEM((2, BQ, H * D), q.dtype),
        pltpu.VMEM((2, BQ, H * V), v.dtype),
        pltpu.VMEM((2, BK, H * D), k.dtype),
        pltpu.VMEM((2, BK, H * V), v.dtype),
    ]
    if has_rab:
        ins.append(raba)
        scratch += [
            pltpu.VMEM((H, BQ, BK), raba.dtype),
            pltpu.VMEM((H, BQ, BK), jnp.float32),
        ]
        def body(meta_ref, q_hbm, k_hbm, v_hbm, do_hbm, rab_hbm,
                 _drab_init, dq_hbm, drab_hbm, *rest):
            dq_kernel(meta_ref, q_hbm, k_hbm, v_hbm, do_hbm, rab_hbm,
                      dq_hbm, drab_hbm, *rest)

        n_in, n_out = 5, 2
        out_shape = [
            jax.ShapeDtypeStruct((lay.T_al, H * D), q.dtype),
            jax.ShapeDtypeStruct((B, H, NQ * BQ, NK * BK), jnp.float32),
        ]
    else:
        scratch += [
            pltpu.VMEM((8, 128), q.dtype),
            pltpu.VMEM((8, 128), jnp.float32),
        ]

        def body(meta_ref, q_hbm, k_hbm, v_hbm, do_hbm, dq_hbm,
                 q_buf, do_buf, k_buf, v_buf, _r, _dr, dq_buf, acc_ref, sem):
            dq_kernel(meta_ref, q_hbm, k_hbm, v_hbm, do_hbm, None,
                      dq_hbm, None, q_buf, do_buf, k_buf, v_buf, None, None,
                      dq_buf, acc_ref, sem)

        n_in, n_out = 4, 1
        out_shape = jax.ShapeDtypeStruct((lay.T_al, H * D), q.dtype)
    scratch += [
        pltpu.VMEM((2, BQ, H * D), q.dtype),
        pltpu.VMEM((BQ, H * D), jnp.float32),
        pltpu.SemaphoreType.DMA((12,)),
    ]
    io_alias = {}
    if has_rab:
        # drab tiles outside the worklist are never written: pre-zero the
        # output by aliasing a zeros buffer to it (operand index counts the
        # scalar-prefetch argument)
        ins.append(jnp.zeros((B, H, NQ * BQ, NK * BK), jnp.float32))
        n_in += 1
        io_alias = {n_in: 1}
    res = pl.pallas_call(
        body,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(MAXT_Q,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * n_in,
            out_specs=(
                [pl.BlockSpec(memory_space=pltpu.ANY)] * n_out
                if n_out > 1
                else pl.BlockSpec(memory_space=pltpu.ANY)
            ),
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        input_output_aliases=io_alias,
        interpret=interpret,
    )(*ins)
    if has_rab:
        dq, drab_full = res
        nr_q, nr_k = rab.shape[2], rab.shape[3]
        drab = drab_full[:, :, :nr_q, :nr_k]
        # broadcast dims of rab accumulate their grads
        if rab.shape[0] == 1 and B > 1:
            drab = drab.sum(axis=0, keepdims=True)
        if rab.shape[1] == 1 and H > 1:
            drab = drab.sum(axis=1, keepdims=True)
        drab = drab.astype(rab.dtype)
    else:
        dq, drab = res, None
    if input_aligned:
        dq = _unpad_head_dim(dq, lay.T_al, H, D0, D)
    else:
        dq = _unpad_head_dim(lay.to_packed(dq), T, H, D0, D)

    # ---- dk/dv
    dkv_kernel = functools.partial(
        _bwd_dkv_kernel, MAXT=MAXT_K, has_rab=has_rab,
        NZ_CH=-(-(B * ATTN_ALIGN + 2 * max(BQ, BK) + 32) // BK) + 1,
        **common
    )
    ins = [meta_k, qa, ka, va, ga]
    scratch = [
        pltpu.VMEM((2, BK, H * D), k.dtype),
        pltpu.VMEM((2, BK, H * V), v.dtype),
        pltpu.VMEM((2, BQ, H * D), q.dtype),
        pltpu.VMEM((2, BQ, H * V), v.dtype),
    ]
    if has_rab:
        ins.append(raba)
        scratch.append(pltpu.VMEM((H, BQ, BK), raba.dtype))
        body2 = dkv_kernel
        n_in = 5
    else:
        scratch.append(pltpu.VMEM((8, 128), q.dtype))

        def body2(meta_ref, q_hbm, k_hbm, v_hbm, do_hbm, dk_hbm, dv_hbm,
                  k_buf, v_buf, q_buf, do_buf, _r, dk_buf, dv_buf,
                  acck_ref, accv_ref, sem):
            dkv_kernel(meta_ref, q_hbm, k_hbm, v_hbm, do_hbm, None,
                       dk_hbm, dv_hbm, k_buf, v_buf, q_buf, do_buf, None,
                       dk_buf, dv_buf, acck_ref, accv_ref, sem)

        n_in = 4
    scratch += [
        pltpu.VMEM((2, BK, H * D), k.dtype),
        pltpu.VMEM((2, BK, H * V), v.dtype),
        pltpu.VMEM((BK, H * D), jnp.float32),
        pltpu.VMEM((BK, H * V), jnp.float32),
        pltpu.SemaphoreType.DMA((13,)),
    ]
    dk, dv = pl.pallas_call(
        body2,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(MAXT_K,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * n_in,
            out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
            scratch_shapes=scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((lay.T_al, H * D), k.dtype),
            jax.ShapeDtypeStruct((lay.T_al, H * V), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*ins)
    if input_aligned:
        dk = _unpad_head_dim(dk, lay.T_al, H, D0, D)
        dv = _unpad_head_dim(dv, lay.T_al, H, V0, V)
    else:
        dk = _unpad_head_dim(lay.to_packed(dk), T, H, D0, D)
        dv = _unpad_head_dim(lay.to_packed(dv), T, H, V0, V)
    return dq, dk, dv, drab


@functools.partial(jax.custom_vjp, nondiff_argnums=tuple(range(4, 16)))
def hstu_attn_varlen(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    aux,  # (seq_offsets [B+1], num_contextuals [B]|None, num_targets [B]|None)
    max_seqlen: int = 0,
    alpha: float = 1.0,
    scaling_seqlen: int = -1,
    causal: bool = True,
    target_group_size: int = 1,
    max_attn_len: int = 0,
    min_full_attn_seq_len: int = 0,
    block_q: int = DEF_BLOCK_Q,
    block_k: int = DEF_BLOCK_K,
    interpret: bool = False,
    input_aligned: bool = False,
    packed_total: int = 0,
):
    """Jagged varlen HSTU attention: q,k [T,H,D], v [T,H,V] -> [T,H,V].

    input_aligned=True: q/k/v/output are in the block-aligned jagged
    layout of `attn_alignment(seq_offsets, packed_total)` ([T_al, H, D]) —
    used by the HSTU block to relayout once per block instead of once per
    layer."""
    return _hstu_fwd_impl(
        q, k, v, None, aux, max_seqlen, alpha, scaling_seqlen, causal,
        target_group_size, max_attn_len, min_full_attn_seq_len,
        block_q, block_k, interpret,
        input_aligned=input_aligned, packed_total=packed_total,
    )


def _vjp_fwd(
    q, k, v, aux,
    max_seqlen, alpha, scaling_seqlen, causal, target_group_size,
    max_attn_len, min_full_attn_seq_len, block_q, block_k, interpret,
    input_aligned, packed_total,
):
    out, aligned = _hstu_fwd_impl(
        q, k, v, None, aux, max_seqlen, alpha, scaling_seqlen, causal,
        target_group_size, max_attn_len, min_full_attn_seq_len,
        block_q, block_k, interpret, return_aligned=True,
        input_aligned=input_aligned, packed_total=packed_total,
    )
    return out, (q, k, v, aux, aligned)


def _vjp_bwd(
    max_seqlen, alpha, scaling_seqlen, causal, target_group_size,
    max_attn_len, min_full_attn_seq_len, block_q, block_k, interpret,
    input_aligned, packed_total,
    residuals, g,
):
    q, k, v, aux, aligned = residuals
    dq, dk, dv, _ = _hstu_bwd_impl(
        q, k, v, None, aux, g,
        max_seqlen, alpha, scaling_seqlen, causal, target_group_size,
        max_attn_len, min_full_attn_seq_len, block_q, block_k, interpret,
        aligned=aligned, input_aligned=input_aligned,
        packed_total=packed_total,
    )
    return dq, dk, dv, None


hstu_attn_varlen.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=tuple(range(5, 15)))
def hstu_attn_varlen_rab(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    rab: jax.Array,  # [B|1, H|1, N, N] dense relative attention bias
    aux,
    max_seqlen: int = 0,
    alpha: float = 1.0,
    scaling_seqlen: int = -1,
    causal: bool = True,
    target_group_size: int = 1,
    max_attn_len: int = 0,
    min_full_attn_seq_len: int = 0,
    block_q: int = DEF_BLOCK_Q,
    block_k: int = DEF_BLOCK_K,
    interpret: bool = False,
):
    """HSTU attention with (trainable) relative attention bias:
    p = silu(q k^T alpha + rab) / scaling * mask
    (reference contract: hstu_attn_varlen_func(rab=..., has_drab=True),
    corelib/hstu/hstu_attn/hstu_attn_interface.py:185)."""
    return _hstu_fwd_impl(
        q, k, v, rab, aux, max_seqlen, alpha, scaling_seqlen, causal,
        target_group_size, max_attn_len, min_full_attn_seq_len,
        block_q, block_k, interpret,
    )


def _vjp_rab_fwd(
    q, k, v, rab, aux,
    max_seqlen, alpha, scaling_seqlen, causal, target_group_size,
    max_attn_len, min_full_attn_seq_len, block_q, block_k, interpret,
):
    out, aligned = _hstu_fwd_impl(
        q, k, v, rab, aux, max_seqlen, alpha, scaling_seqlen, causal,
        target_group_size, max_attn_len, min_full_attn_seq_len,
        block_q, block_k, interpret, return_aligned=True,
    )
    return out, (q, k, v, rab, aux, aligned)


def _vjp_rab_bwd(
    max_seqlen, alpha, scaling_seqlen, causal, target_group_size,
    max_attn_len, min_full_attn_seq_len, block_q, block_k, interpret,
    residuals, g,
):
    q, k, v, rab, aux, aligned = residuals
    dq, dk, dv, drab = _hstu_bwd_impl(
        q, k, v, rab, aux, g,
        max_seqlen, alpha, scaling_seqlen, causal, target_group_size,
        max_attn_len, min_full_attn_seq_len, block_q, block_k, interpret,
        aligned=aligned,
    )
    return dq, dk, dv, drab, None


hstu_attn_varlen_rab.defvjp(_vjp_rab_fwd, _vjp_rab_bwd)


def hstu_attn_varlen_quantized_calibrated(
    q_int8: jax.Array,
    k_int8: jax.Array,
    v_int8: jax.Array,
    q_scale: float,
    k_scale: float,
    v_scale: float,
    aux,
    max_seqlen: int = 0,
    alpha: float = 1.0,
    scaling_seqlen: int = -1,
    causal: bool = True,
    target_group_size: int = 1,
    max_attn_len: int = 0,
    min_full_attn_seq_len: int = 0,
    block_q: int = DEF_BLOCK_Q,
    block_k: int = DEF_BLOCK_K,
    interpret: bool = False,
):
    """Int8-quantized HSTU attention forward (inference).

    TPU counterpart of the reference's FP8 quantized HSTU-3 attention
    (per-tensor mode of the `quantization_mode` argument,
    corelib/hstu/hstu_attn/hstu_attn_interface.py:185). v5e's MXU native
    low-precision type is int8: inputs arrive symmetrically quantized with
    static calibration scales (the production serving pattern), the qk
    matmul contracts dequantized tiles, q/k scales fold into alpha and the
    v scale into the output epilogue. Forward only, like the reference's
    FP8 path. Returns bf16 [T, H, V].

    Status: runs compiled on-chip (v5e, verified vs the bf16 kernel at
    ~2e-2 relative error from the int8 quantization itself); also
    interpret-mode tested. The win on this DMA-bound kernel is the halved
    K/V HBM traffic, independent of the MAC precision.
    """
    return _hstu_fwd_impl(
        q_int8, k_int8, v_int8, None, aux, max_seqlen,
        float(alpha) * float(q_scale) * float(k_scale),
        scaling_seqlen, causal,
        target_group_size, max_attn_len, min_full_attn_seq_len,
        block_q, block_k, interpret, quantized=True,
        v_scale=float(v_scale), out_dtype=jnp.bfloat16,
    )


def quantize_per_tensor(x: jax.Array):
    """Symmetric int8 per-tensor quantization helper. Returns
    (values int8, scale float)."""
    import numpy as np

    s_ = max(float(jnp.max(jnp.abs(x))), 1e-12) / 127.0
    xi = jnp.clip(
        jnp.round(x.astype(jnp.float32) * (1.0 / s_)), -127, 127
    ).astype(jnp.int8)
    return xi, s_
