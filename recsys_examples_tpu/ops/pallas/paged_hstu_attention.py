"""Pallas TPU paged HSTU (SiLU) delta attention for KV-cached inference.

TPU-native counterpart of the reference's paged HSTU inference kernel
(examples/hstu/modules/paged_hstu_infer_layer.py:41 `PagedHSTUInferLayer`:
append_kvcache -> paged HSTU attention; mask semantics:
examples/hstu/ops/pt_ops/pt_hstu_attention.py:199
`_get_delta_valid_attn_mask`).

New-token queries attend over [user's cached pages ++ the new tokens
themselves]. K/V pages are read DIRECTLY from the paged pool via the page
table (scalar-prefetched into SMEM so each page's DMA address is known
before the body runs) — no dense gather materialization.

SiLU attention has no softmax statistics, so the page loop is a plain
accumulate: acc += (silu(q k^T alpha)/scaling * mask) @ v. Double-buffered
page DMA overlaps the per-page MXU work.

Mask (delta-q semantics):
  valid(row=global q pos, col) = (col == row) or (dist > 0), with
  row/col clamped to history end when num_targets is set (targets attend
  history + themselves but not other targets), and col < kv_len.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def paged_hstu_delta_attention_ref(
    q: jax.Array,          # [B, S, H, dh] new-token queries
    k_pages: jax.Array,    # [P, pg, H, dh] one layer's key pages
    v_pages: jax.Array,    # [P, pg, H, dh]
    page_table: jax.Array,  # [B, maxp] int32 page ids (-1 unset)
    cached_len: jax.Array,  # [B] int32 cached tokens
    new_k: jax.Array,      # [B, S, H, dh] the new tokens' keys
    new_v: jax.Array,      # [B, S, H, dh]
    new_lens: jax.Array,   # [B] valid new tokens
    num_targets: jax.Array | None,  # [B] or None
    alpha: float,
    scaling_seqlen: float,
) -> jax.Array:
    """jnp twin: gathers pages densely then applies delta attention."""
    B, S, H, dh = q.shape
    pg = k_pages.shape[1]
    maxp = page_table.shape[1]
    N = maxp * pg
    pid = jnp.clip(page_table, 0, k_pages.shape[0] - 1)  # [B, maxp]
    kc = k_pages[pid].reshape(B, N, H, dh)
    vc = v_pages[pid].reshape(B, N, H, dh)
    kv_len = cached_len + new_lens
    # splice new tokens at positions cached_len + i
    pos = jnp.arange(N, dtype=jnp.int32)[None, :]
    rel = pos - cached_len[:, None]
    is_new = (rel >= 0) & (rel < S)
    reli = jnp.clip(rel, 0, S - 1)
    take = lambda cached, new: jnp.where(
        is_new[..., None, None],
        jnp.take_along_axis(new, reli[..., None, None], axis=1),
        cached,
    )
    kc = take(kc, new_k)
    vc = take(vc, new_v)
    sc = jnp.einsum(
        "bshd,bnhd->bhsn", q.astype(jnp.float32), kc.astype(jnp.float32)
    ) * alpha
    p = jax.nn.silu(sc) / scaling_seqlen
    row = (cached_len[:, None] + jnp.arange(S, dtype=jnp.int32)[None])[
        :, :, None
    ]                                                   # [B, S, 1]
    col = jnp.broadcast_to(pos[:, None, :], (B, S, N))  # [B, S, N]
    if num_targets is not None:
        hist_end = (kv_len - num_targets).astype(jnp.int32)[:, None, None]
        rowc = jnp.minimum(row, hist_end)
        colc = jnp.minimum(col, hist_end)
    else:
        rowc, colc = row, col
    valid = (col == row) | (rowc - colc > 0)
    valid &= col < kv_len[:, None, None]
    # zero padded query rows (i >= new_lens)
    valid &= (jnp.arange(S, dtype=jnp.int32)[None, :] <
              new_lens[:, None])[:, :, None]
    p = p * valid[:, None].astype(p.dtype)
    out = jnp.einsum("bhsn,bnhd->bshd", p, vc.astype(jnp.float32))
    return out.astype(q.dtype)


def _kernel(
    meta_ref,    # scalar prefetch: [B*(3+maxp)] = cached_len ++ new_lens ++
                 # num_targets ++ page_table rows
    q_hbm, kp_hbm, vp_hbm, nk_hbm, nv_hbm,
    *rest,
    B, S, H, dh, PG, MAXP, alpha, inv_scaling, has_targets,
    quantized=False,
):
    # int8-KV mode (quantized=True) threads two extra HBM inputs (per-
    # token-per-head K/V scales [P, PG, 128-padded-H]) and two extra VMEM
    # scratch buffers; page DMA volume halves (int8 vs bf16) while scales
    # fold into the [S, PG] score/probability matrices — no K/V block
    # dequantization (reference analogue: hstu_attn quantization_mode,
    # hstu_attn_interface.py:185, as a bandwidth feature).
    if quantized:
        (ks_hbm, vs_hbm, o_hbm,
         q_buf, nk_buf, nv_buf, k_buf, v_buf, ks_buf, vs_buf, acc_ref,
         sem) = rest
    else:
        (o_hbm,
         q_buf, nk_buf, nv_buf, k_buf, v_buf, acc_ref,
         sem) = rest
        ks_buf = vs_buf = None
    b = pl.program_id(0)
    # x64 is enabled framework-wide; keep scalars 32-bit for Mosaic
    alpha = jnp.float32(alpha)
    inv_scaling = jnp.float32(inv_scaling)
    cached = meta_ref[b]
    new_len = meta_ref[B + b]
    n_tgt = meta_ref[2 * B + b] if has_targets else jnp.int32(0)
    kv_len = cached + new_len

    dq = pltpu.make_async_copy(q_hbm.at[b], q_buf, sem.at[jnp.int32(0)])
    dnk = pltpu.make_async_copy(nk_hbm.at[b], nk_buf, sem.at[jnp.int32(1)])
    dnv = pltpu.make_async_copy(nv_hbm.at[b], nv_buf, sem.at[jnp.int32(2)])
    dq.start()
    dnk.start()
    dnv.start()

    num_pages = (cached + jnp.int32(PG) - 1) // jnp.int32(PG)

    def page_dma(slot, j):
        pid = meta_ref[3 * B + b * MAXP + j]
        pid = jnp.maximum(pid, 0)
        copies = [
            pltpu.make_async_copy(kp_hbm.at[pid], k_buf.at[slot], sem.at[jnp.int32(3) + slot]),
            pltpu.make_async_copy(vp_hbm.at[pid], v_buf.at[slot], sem.at[jnp.int32(5) + slot]),
        ]
        if quantized:
            copies.append(pltpu.make_async_copy(
                ks_hbm.at[pid], ks_buf.at[slot], sem.at[jnp.int32(7) + slot]
            ))
            copies.append(pltpu.make_async_copy(
                vs_hbm.at[pid], vs_buf.at[slot], sem.at[jnp.int32(9) + slot]
            ))
        return copies

    @pl.when(num_pages > 0)
    def _start0():
        for c in page_dma(jnp.int32(0), jnp.int32(0)):
            c.start()

    acc_ref[:] = jnp.zeros_like(acc_ref)
    dq.wait()
    qf = q_buf[:].astype(jnp.float32)          # [S, H*dh]
    row = cached + jax.lax.broadcasted_iota(jnp.int32, (S, PG), 0)
    hist_end = kv_len - n_tgt

    def mask_for(col):
        rowc = jnp.minimum(row, hist_end)
        colc = jnp.minimum(col, hist_end)
        valid = (col == row) | (rowc - colc > 0)
        # page loop covers only genuinely-cached positions; the new tokens
        # (positions cached..kv_len) come from the tail block
        valid &= col < cached
        valid &= jax.lax.broadcasted_iota(jnp.int32, (S, PG), 0) < new_len
        return valid.astype(jnp.float32)

    def body(j, _):
        slot = jax.lax.rem(j, jnp.int32(2))

        @pl.when(j + 1 < num_pages)
        def _next():
            for c in page_dma(jax.lax.rem(j + 1, jnp.int32(2)), j + 1):
                c.start()

        for c in page_dma(slot, j):
            c.wait()
        kf = k_buf[slot]
        vf = v_buf[slot]
        col = j * jnp.int32(PG) + jax.lax.broadcasted_iota(
            jnp.int32, (S, PG), 1
        )
        m = mask_for(col)
        for h in range(H):
            hs = slice(h * dh, (h + 1) * dh)
            sc = jax.lax.dot_general(
                qf[:, hs],
                kf[:, hs].astype(jnp.float32) if quantized else kf[:, hs],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * alpha
            if quantized:
                # fold the per-(token, head) K scale into the scores and
                # the V scale into the probabilities: two [S, PG] VPU
                # multiplies instead of dequantizing [PG, dh] blocks
                sc = sc * ks_buf[slot][:, h][None, :]
            p = jax.nn.silu(sc) * inv_scaling * m
            if quantized:
                p = p * vs_buf[slot][:, h][None, :]
                acc_ref[:, hs] += jax.lax.dot_general(
                    p, vf[:, hs].astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                )
            else:
                acc_ref[:, hs] += jax.lax.dot_general(
                    p.astype(vf.dtype), vf[:, hs],
                    preferred_element_type=jnp.float32,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                )
        return jnp.int32(0)

    jax.lax.fori_loop(jnp.int32(0), num_pages, body, jnp.int32(0),
                      unroll=False)

    # tail: the new tokens' own K/V (positions cached + [0, S))
    dnk.wait()
    dnv.wait()
    nk = nk_buf[:]
    nv = nv_buf[:]
    col_n = cached + jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    row_n = cached + jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    rowc = jnp.minimum(row_n, hist_end)
    colc = jnp.minimum(col_n, hist_end)
    valid = (col_n == row_n) | (rowc - colc > 0)
    valid &= col_n < kv_len
    valid &= jax.lax.broadcasted_iota(jnp.int32, (S, S), 0) < new_len
    mt = valid.astype(jnp.float32)
    for h in range(H):
        hs = slice(h * dh, (h + 1) * dh)
        sc = jax.lax.dot_general(
            q_buf[:].astype(jnp.float32)[:, hs], nk[:, hs].astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * alpha
        p = jax.nn.silu(sc) * inv_scaling * mt
        acc_ref[:, hs] += jax.lax.dot_general(
            p.astype(nv.dtype), nv[:, hs],
            preferred_element_type=jnp.float32,
            dimension_numbers=(((1,), (0,)), ((), ())),
        )

    o_buf = acc_ref[:].astype(o_hbm.dtype)
    # write via VMEM->HBM copy through nk_buf-sized scratch (reuse q_buf
    # shape): allocate dedicated out buffer instead
    q_buf[:] = o_buf.astype(q_buf.dtype)
    do = pltpu.make_async_copy(q_buf, o_hbm.at[b], sem.at[jnp.int32(0)])
    do.start()
    do.wait()


def quantize_kv_pages(k_pages: jax.Array, v_pages: jax.Array):
    """bf16/f32 pages [P, pg, H, dh] -> (int8 pages, per-(token, head)
    f32 scales [P, pg, H]) for the int8-KV kernel path. Halves the page
    DMA bytes; symmetric per-token-per-head scaling keeps the SiLU
    attention error at bf16-noise level."""
    def one(x):
        a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)  # [P, pg, H]
        s = a / 127.0
        q8 = jnp.round(
            x.astype(jnp.float32) / jnp.maximum(s, 1e-12)[..., None]
        ).astype(jnp.int8)
        return q8, s
    k8, ks = one(k_pages)
    v8, vs = one(v_pages)
    return k8, v8, ks, vs


def paged_hstu_delta_attention(
    q, k_pages, v_pages, page_table, cached_len, new_k, new_v, new_lens,
    num_targets, alpha: float, scaling_seqlen: float,
    *, k_scales=None, v_scales=None,
    backend: str = "auto", interpret: bool = False,
):
    """Paged SiLU delta attention. Returns [B, S, H, dh].

    k_pages/v_pages: [P, pg, H, dh] single-layer pools — bf16/f32, or
    int8 with `k_scales`/`v_scales` [P, pg, H] from quantize_kv_pages.
    """
    quantized = k_scales is not None
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    if backend == "jnp":
        if quantized:
            k_pages = k_pages.astype(jnp.float32) * k_scales[..., None]
            v_pages = v_pages.astype(jnp.float32) * v_scales[..., None]
        return paged_hstu_delta_attention_ref(
            q, k_pages, v_pages, page_table, cached_len, new_k, new_v,
            new_lens, num_targets, alpha, scaling_seqlen,
        )
    B, S0, H, dh0 = q.shape
    P, PG = k_pages.shape[:2]
    MAXP = page_table.shape[1]
    has_targets = num_targets is not None
    # Mosaic alignment: lane dim (per-head) in 128 multiples, new-token rows
    # in sublane (8) multiples. Zero-padded K columns add zero scores;
    # padded rows/columns are sliced away below.
    rup = lambda x, m: ((x + m - 1) // m) * m
    dh = rup(dh0, 128)
    S = rup(S0, 8)
    # the whole new-token block lives in VMEM (q, new K/V, f32 acc):
    # sized for decode/delta steps, not long prefills — chunk those
    # (serving feeds history in max_new-bucket steps) or use the varlen
    # training kernel for the uncached prefill
    assert S * H * dh * 16 <= 12 * 2 ** 20, (
        f"paged kernel new-token block too large for VMEM "
        f"(S={S0}, H={H}, dh={dh0}); chunk the prefill"
    )

    def pad_to(x, shape):
        return jnp.pad(x, [(0, t - c) for c, t in zip(x.shape, shape)])

    q = pad_to(q, (B, S, H, dh))
    new_k = pad_to(new_k, (B, S, H, dh))
    new_v = pad_to(new_v, (B, S, H, dh))
    k_pages = pad_to(k_pages, (P, PG, H, dh))
    v_pages = pad_to(v_pages, (P, PG, H, dh))
    meta = jnp.concatenate([
        cached_len.astype(jnp.int32),
        new_lens.astype(jnp.int32),
        (num_targets.astype(jnp.int32) if has_targets
         else jnp.zeros((B,), jnp.int32)),
        page_table.astype(jnp.int32).reshape(-1),
    ])
    kernel = functools.partial(
        _kernel, B=B, S=S, H=H, dh=dh, PG=PG, MAXP=MAXP,
        alpha=float(alpha), inv_scaling=1.0 / float(scaling_seqlen),
        has_targets=has_targets, quantized=quantized,
    )
    scratch = [
        pltpu.VMEM((S, H * dh), q.dtype),
        pltpu.VMEM((S, H * dh), new_k.dtype),
        pltpu.VMEM((S, H * dh), new_v.dtype),
        pltpu.VMEM((2, PG, H * dh), k_pages.dtype),
        pltpu.VMEM((2, PG, H * dh), v_pages.dtype),
    ]
    inputs = [
        meta,
        q.reshape(B, S, H * dh),
        k_pages.reshape(P, PG, H * dh),
        v_pages.reshape(P, PG, H * dh),
        new_k.reshape(B, S, H * dh),
        new_v.reshape(B, S, H * dh),
    ]
    n_in = 5
    n_sem = 7
    if quantized:
        # scales ride as [P, PG, 128] (lane-padded head axis)
        assert H <= 128, "int8-KV path assumes <= 128 heads"
        ksp = pad_to(k_scales.astype(jnp.float32), (P, PG, 128))
        vsp = pad_to(v_scales.astype(jnp.float32), (P, PG, 128))
        inputs.extend([ksp, vsp])
        scratch.extend([
            pltpu.VMEM((2, PG, 128), jnp.float32),
            pltpu.VMEM((2, PG, 128), jnp.float32),
        ])
        n_in = 7
        n_sem = 11
    scratch.append(pltpu.VMEM((S, H * dh), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((n_sem,)))
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * n_in,
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, H * dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*inputs)
    return out.reshape(B, S, H, dh)[:, :S0, :, :dh0]
