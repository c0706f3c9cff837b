"""Pallas TPU beam-decode attention (context KV + beam-sparse KV, fused).

TPU-native counterpart of the reference's `gr_decode_atten` corelib
(contract: corelib/gr_decode_atten/interface.py:835 `beam_decode_attn`;
semantics twin: examples/sid_gr/model/jagged_flash_attn_block.py:58
`_beam_decode_attn_reference`). The reference ships a 3-kernel pipeline
(context K1 / beam-sparse K2 / LSE-combine K3) plus per-arch fused CuTe
kernels; on TPU a single fused kernel is the right shape: the sequential
grid lets one online-softmax accumulator stream the context KV *and* fold
in the beam-sparse tail, so there is no partial-LSE write-back at all.

Semantics, per batch b, query beam w, head h (one decode step):
    keys = ctx[b, :len_b]  ++  [beam[b, n, ancestry[b, n, w]] for n < N]
    out  = softmax(q . keys * scale) @ values

Design notes (TPU-first):
  - Grid (B, H, num_ctx_blocks): the context part is [W, BK] @ MXU matmuls
    with a running (m, l, acc) in VMEM scratch, persisting across the
    sequential ctx-block axis (classic flash pattern).
  - The beam-sparse gather is done as a ONE-HOT MATMUL: ancestry indices
    become a [W, W] one-hot matrix built from an iota compare, and the
    per-step gathered K/V are `onehot.T @ k_beam_step` — an MXU op,
    avoiding unsupported dynamic row gathers inside the kernel. N (decode
    steps so far) is tiny for SID (<= hierarchies-1), so the beam tail is
    a few rank-1 online-softmax updates folded in on the last ctx block.
  - GQA: kv head = query head // (H // Hkv).
  - fp32 accumulation throughout; output in q's dtype.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEF_BLOCK_CTX = 256
NEG_INF = -1e30


def beam_decode_attn_ref(
    q: jax.Array,        # [B, W, H, D]
    k_ctx: jax.Array,    # [B, S, Hkv, D]
    v_ctx: jax.Array,    # [B, S, Hkv, D]
    ctx_lens: jax.Array,  # [B] int32 valid context lengths
    k_beam: jax.Array | None,  # [B, N, W, Hkv, D] (None when N == 0)
    v_beam: jax.Array | None,
    ancestry: jax.Array | None,  # [B, N, W] int32 beam slot per step
    sm_scale: float = 1.0,
) -> jax.Array:
    """Pure-jnp reference twin (and CPU path). Returns [B, W, H, D]."""
    B, W, H, D = q.shape
    S = k_ctx.shape[1]
    Hkv = k_ctx.shape[2]
    G = H // Hkv
    qf = q.astype(jnp.float32)
    kc = k_ctx.astype(jnp.float32)
    vc = v_ctx.astype(jnp.float32)
    # repeat kv heads for GQA
    kc = jnp.repeat(kc, G, axis=2)
    vc = jnp.repeat(vc, G, axis=2)
    s_ctx = jnp.einsum("bwhd,bshd->bwhs", qf, kc) * sm_scale
    valid = jnp.arange(S)[None, :] < ctx_lens[:, None]  # [B, S]
    s_ctx = jnp.where(valid[:, None, None, :], s_ctx, NEG_INF)
    if k_beam is not None and k_beam.shape[1] > 0:
        N = k_beam.shape[1]
        kb = jnp.repeat(k_beam.astype(jnp.float32), G, axis=3)
        vb = jnp.repeat(v_beam.astype(jnp.float32), G, axis=3)
        # gather ancestry rows: [B, N, W, H, D]
        anc = ancestry[..., None, None]  # [B, N, W, 1, 1]
        kg = jnp.take_along_axis(kb, jnp.broadcast_to(anc, (B, N, W, H, D)), axis=2)
        vg = jnp.take_along_axis(vb, jnp.broadcast_to(anc, (B, N, W, H, D)), axis=2)
        s_beam = jnp.einsum("bwhd,bnwhd->bwhn", qf, kg) * sm_scale
        scores = jnp.concatenate([s_ctx, s_beam], axis=-1)  # [B,W,H,S+N]
        p = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bwhs,bshd->bwhd", p[..., :S], vc) + jnp.einsum(
            "bwhn,bnwhd->bwhd", p[..., S:], vg
        )
    else:
        p = jax.nn.softmax(s_ctx, axis=-1)
        out = jnp.einsum("bwhs,bshd->bwhd", p, vc)
    return out.astype(q.dtype)


def _kernel(
    ctx_lens_ref,  # scalar prefetch [B] int32
    q_hbm,        # [B, H, W, D]
    kc_hbm,       # [B, Hkv, S, D]
    vc_hbm,
    kb_hbm,       # [B, Hkv, N*W, D] or None
    vb_hbm,
    anc_hbm,      # [B, Npad, W] int32 or None
    o_hbm,        # [B, H, W, D]
    q_buf, k_buf, v_buf, kb_buf, vb_buf, anc_buf, o_buf,
    acc_ref, m_ref, l_ref,
    sem,
    *, W, D, BK, N, NPAD, G, sm_scale,
):
    # manual-DMA form: BlockSpec index maps are avoided entirely — under
    # jax_enable_x64 (framework-wide, for int64 embedding keys) index-map
    # literals trace as i64, which this Mosaic stack cannot lower.
    b = pl.program_id(0)
    h = pl.program_id(1)
    kvh = h // jnp.int32(G)
    # x64 is enabled framework-wide; keep every scalar f32/i32 so nothing
    # 64-bit reaches Mosaic (it cannot lower 64-bit scalars)
    sm_scale = jnp.float32(sm_scale)
    neg_inf = jnp.float32(NEG_INF)
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    ctx_len = ctx_lens_ref[b]
    NSb = (ctx_len + jnp.int32(BK) - 1) // jnp.int32(BK)

    dq = pltpu.make_async_copy(q_hbm.at[b, h], q_buf, sem.at[jnp.int32(0)])
    dq.start()
    if N > 0:
        dkb = pltpu.make_async_copy(
            kb_hbm.at[b, kvh], kb_buf, sem.at[jnp.int32(1)]
        )
        dvb = pltpu.make_async_copy(
            vb_hbm.at[b, kvh], vb_buf, sem.at[jnp.int32(2)]
        )
        danc = pltpu.make_async_copy(
            anc_hbm.at[b], anc_buf, sem.at[jnp.int32(3)]
        )
        dkb.start()
        dvb.start()
        danc.start()

    def kv_dma(slot, j):
        ks = pl.multiple_of(j * jnp.int32(BK), BK)
        return (
            pltpu.make_async_copy(
                kc_hbm.at[b, kvh, pl.ds(ks, BK)], k_buf.at[slot],
                sem.at[jnp.int32(4) + slot],
            ),
            pltpu.make_async_copy(
                vc_hbm.at[b, kvh, pl.ds(ks, BK)], v_buf.at[slot],
                sem.at[jnp.int32(6) + slot],
            ),
        )

    @pl.when(NSb > 0)
    def _start0():
        a, bb = kv_dma(jnp.int32(0), jnp.int32(0))
        a.start()
        bb.start()

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, jnp.float32(NEG_INF))
    l_ref[:] = jnp.zeros_like(l_ref)
    dq.wait()
    q = q_buf[:].astype(jnp.float32)              # [W, D]

    def body(j, _):
        slot = jax.lax.rem(j, jnp.int32(2))

        @pl.when(j + 1 < NSb)
        def _next():
            a, bb = kv_dma(jax.lax.rem(j + 1, jnp.int32(2)), j + 1)
            a.start()
            bb.start()

        a, bb = kv_dma(slot, j)
        a.wait()
        bb.wait()
        kc = k_buf[slot].astype(jnp.float32)
        sc = jax.lax.dot_general(
            q, kc, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale                               # [W, BK]
        col = j * jnp.int32(BK) + jax.lax.broadcasted_iota(
            jnp.int32, (W, BK), 1
        )
        sc = jnp.where(col < ctx_len, sc, neg_inf)
        m_old = m_ref[:, :1]
        l_old = l_ref[:, :1]
        m_new = jnp.maximum(m_old, jnp.max(sc, axis=1, keepdims=True))
        corr = jnp.exp(m_old - m_new)
        p = jnp.exp(sc - m_new)
        vc = v_buf[slot].astype(jnp.float32)
        acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
            p, vc, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        l_ref[:] = jnp.broadcast_to(
            l_old * corr + jnp.sum(p, axis=1, keepdims=True), l_ref.shape
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        return jnp.int32(0)

    jax.lax.fori_loop(jnp.int32(0), NSb, body, jnp.int32(0), unroll=False)

    m_c = m_ref[:, :1]
    l_c = l_ref[:, :1]
    a_c = acc_ref[:]
    if N > 0:
        dkb.wait()
        dvb.wait()
        danc.wait()
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
        for n in range(N):
            anc_row = anc_buf[n:n + 1, :]          # [1, W]
            onehot = jnp.where(row_iota == anc_row, one, zero)
            kb = kb_buf[n * W:(n + 1) * W].astype(jnp.float32)
            vb = vb_buf[n * W:(n + 1) * W].astype(jnp.float32)
            kg = jax.lax.dot_general(  # [W, D] ancestry-gathered keys
                onehot, kb,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            vg = jax.lax.dot_general(
                onehot, vb,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s_n = jnp.sum(q * kg, axis=1, keepdims=True) * sm_scale
            m_n = jnp.maximum(m_c, s_n)
            c_n = jnp.exp(m_c - m_n)
            p_n = jnp.exp(s_n - m_n)               # [W, 1]
            a_c = a_c * c_n + p_n * vg
            l_c = l_c * c_n + p_n
            m_c = m_n

    # l_c can be 0 when ctx_len==0 and there is no beam tail (N==0);
    # guard the divide so the public API's degenerate input yields 0, not NaN
    # (matches the jnp twin's NEG_INF-softmax behavior).
    o_buf[:] = (a_c / jnp.maximum(l_c, 1e-30)).astype(o_buf.dtype)
    do = pltpu.make_async_copy(o_buf, o_hbm.at[b, h], sem.at[jnp.int32(0)])
    do.start()
    do.wait()


def _pallas_impl(
    q, k_ctx, v_ctx, ctx_lens, k_beam, v_beam, ancestry, sm_scale,
    block_ctx, interpret,
):
    B, W0, H, D0 = q.shape
    S = k_ctx.shape[1]
    Hkv = k_ctx.shape[2]
    G = H // Hkv
    N = 0 if k_beam is None else k_beam.shape[1]
    # Mosaic DMA alignment: last (lane) dim in 128 multiples, row slices in
    # sublane (8) multiples. Zero-padded K columns add zero scores; padded
    # V columns and beam rows are sliced away below.
    rup = lambda x, m: ((x + m - 1) // m) * m
    D = rup(D0, 128)
    # W is a sublane dim for q but the LANE dim of the ancestry rows and
    # the one-hot gather, so it needs 128 alignment when a beam tail exists
    W = rup(W0, 128 if N > 0 else 8)
    BK = min(block_ctx, rup(S, 128))
    S_pad = rup(S, BK)

    def pad_to(x, shape):
        return jnp.pad(x, [(0, t - c) for c, t in zip(x.shape, shape)])

    qt = pad_to(q.transpose(0, 2, 1, 3), (B, H, W, D))
    kct = pad_to(k_ctx.transpose(0, 2, 1, 3), (B, Hkv, S_pad, D))
    vct = pad_to(v_ctx.transpose(0, 2, 1, 3), (B, Hkv, S_pad, D))
    ins = [qt, kct, vct]
    NPAD = max(8, N)
    scratch = [
        pltpu.VMEM((W, D), q.dtype),
        pltpu.VMEM((2, BK, D), k_ctx.dtype),
        pltpu.VMEM((2, BK, D), v_ctx.dtype),
    ]
    if N > 0:
        # [B, N, W, Hkv, D] -> [B, Hkv, N*W, D]
        kbt = pad_to(
            k_beam.transpose(0, 3, 1, 2, 4), (B, Hkv, N, W, D)
        ).reshape(B, Hkv, N * W, D)
        vbt = pad_to(
            v_beam.transpose(0, 3, 1, 2, 4), (B, Hkv, N, W, D)
        ).reshape(B, Hkv, N * W, D)
        anc = jnp.zeros((B, NPAD, W), jnp.int32).at[:, :N, :W0].set(
            ancestry.astype(jnp.int32)
        )
        ins += [kbt, vbt, anc]
        scratch += [
            pltpu.VMEM((N * W, D), k_beam.dtype),
            pltpu.VMEM((N * W, D), v_beam.dtype),
            pltpu.VMEM((NPAD, W), jnp.int32),
        ]
    else:
        scratch += [
            pltpu.VMEM((8, 128), q.dtype),
            pltpu.VMEM((8, 128), q.dtype),
            pltpu.VMEM((8, 128), jnp.int32),
        ]
    scratch += [
        pltpu.VMEM((W, D), q.dtype),     # o_buf
        pltpu.VMEM((W, D), jnp.float32),  # acc
        pltpu.VMEM((W, 128), jnp.float32),  # m
        pltpu.VMEM((W, 128), jnp.float32),  # l
        pltpu.SemaphoreType.DMA((8,)),
    ]

    kernel = functools.partial(
        _kernel, W=W, D=D, BK=BK, N=N, NPAD=NPAD, G=G,
        sm_scale=float(sm_scale),
    )
    if N == 0:
        def kernel3(ctx_lens_ref, q_hbm, kc_hbm, vc_hbm, o_hbm, *rest):
            kernel(ctx_lens_ref, q_hbm, kc_hbm, vc_hbm, None, None, None,
                   o_hbm, *rest)
        body = kernel3
        n_in = 3
    else:
        body = kernel
        n_in = 6

    out = pl.pallas_call(
        body,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * n_in,
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(ctx_lens.astype(jnp.int32), *ins)
    return out[:, :, :W0, :D0].transpose(0, 2, 1, 3)


def beam_decode_attn(
    q: jax.Array,
    k_ctx: jax.Array,
    v_ctx: jax.Array,
    ctx_lens: jax.Array,
    k_beam: jax.Array | None = None,
    v_beam: jax.Array | None = None,
    ancestry: jax.Array | None = None,
    sm_scale: float = 1.0,
    *,
    block_ctx: int = DEF_BLOCK_CTX,
    backend: str = "auto",
    interpret: bool = False,
) -> jax.Array:
    """Fused beam-decode attention. q [B,W,H,D] -> out [B,W,H,D].

    backend: "auto" (pallas on TPU, jnp otherwise) | "pallas" | "jnp".
    """
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    if backend == "jnp":
        return beam_decode_attn_ref(
            q, k_ctx, v_ctx, ctx_lens, k_beam, v_beam, ancestry, sm_scale
        )
    return _pallas_impl(
        q, k_ctx, v_ctx, ctx_lens, k_beam, v_beam, ancestry, sm_scale,
        block_ctx, interpret,
    )
