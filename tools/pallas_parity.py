"""Compiled-vs-reference parity for every Pallas kernel, as an artifact.

CI runs the kernels in interpret mode on CPU (tests/test_pallas_*); this
tool runs them COMPILED on the real chip against their f32 jnp twins and
records the result in benchmarks/results/pallas_parity.json, so on-TPU
kernel correctness is a committed artifact rather than a side effect of
bench runs (reference analogue: corelib/hstu test matrix executed on GPU
CI, hstu_attn/test/).

Covers: hstu_attn_varlen fwd + dq/dk/dv (causal, contextual+targets,
local-window), hstu_attn_varlen_rab fwd + drab, paged delta attention,
beam-decode attention. Run on any backend; the artifact records which.

Usage: python tools/pallas_parity.py [--out benchmarks/results/pallas_parity.json]
"""
import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from recsys_examples_tpu.utils.backend import honor_platform_env  # noqa: E402

honor_platform_env()

import numpy as np


def _maxerr(a, b):
    """(max abs err, err normalized by rtol*scale + atol). Pass = < 1.
    atol floors the comparison at bf16 rounding noise so near-zero
    outputs (e.g. long-sequence 1/n-scaled SiLU attention) don't inflate
    the relative metric."""
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    err = float(np.abs(a - b).max())
    scale = float(np.abs(b).max())
    return err, err / (2e-2 * scale + 1e-3)


def check_varlen(results):
    import jax
    import jax.numpy as jnp

    interp = jax.default_backend() != "tpu"

    from recsys_examples_tpu.ops.hstu_attention_ref import (
        hstu_mha_reference,
    )
    from recsys_examples_tpu.ops.pallas.hstu_attention import (
        hstu_attn_varlen,
        hstu_attn_varlen_rab,
    )

    H, D, N = 2, 128, 512
    lengths = np.array([400, 37, 256, 129], np.int32)
    T = 1024
    offs = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
    rng = np.random.default_rng(0)

    def mk(scale=0.3):
        x = rng.standard_normal((T, H, D)).astype(np.float32) * scale
        x[offs[-1]:] = 0
        return jnp.asarray(x, jnp.bfloat16)

    q, k, v = mk(), mk(), mk()
    cases = {
        "causal": (None, None, {}),
        "ctx_targets": (
            np.array([3, 2, 0, 1], np.int32),
            np.array([10, 4, 6, 8], np.int32),
            dict(target_group_size=2),
        ),
        "local_window": (None, None, dict(max_attn_len=64)),
    }
    for name, (nc, nt, kw) in cases.items():
        aux = (
            jnp.asarray(offs),
            None if nc is None else jnp.asarray(nc),
            None if nt is None else jnp.asarray(nt),
        )

        def loss_pallas(q, k, v):
            return hstu_attn_varlen(
                q, k, v, aux, max_seqlen=N, alpha=0.08, interpret=interp,
                **kw
            ).astype(jnp.float32).sum()

        def loss_ref(q, k, v):
            return hstu_mha_reference(
                N, 0.08, q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32), aux[0],
                num_contextuals=aux[1], num_targets=aux[2], **kw
            ).sum()

        out = jax.jit(lambda q, k, v: hstu_attn_varlen(
            q, k, v, aux, max_seqlen=N, alpha=0.08, interpret=interp,
            **kw))(q, k, v)
        ref = hstu_mha_reference(
            N, 0.08, q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32), aux[0],
            num_contextuals=aux[1], num_targets=aux[2], **kw)
        aerr, rerr = _maxerr(out, ref)
        results.append({"kernel": f"hstu_attn_varlen/{name}/fwd",
                        "max_abs_err": aerr, "norm_err": rerr,
                        "pass": rerr < 1.0})
        g = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2)))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for gi, (a, b) in enumerate(zip(g, gr)):
            aerr, rerr = _maxerr(a, b)
            results.append({
                "kernel": f"hstu_attn_varlen/{name}/d{'qkv'[gi]}",
                "max_abs_err": aerr, "norm_err": rerr,
                "pass": rerr < 1.0,
            })

    # rab + drab
    B = len(lengths)
    rab = jnp.asarray(
        rng.standard_normal((B, H, N, N)).astype(np.float32) * 0.1
    )
    aux = (jnp.asarray(offs), None, None)

    def loss_rab_pallas(rab):
        return hstu_attn_varlen_rab(
            q, k, v, rab, aux, max_seqlen=N, alpha=0.08, interpret=interp,
        ).astype(jnp.float32).sum()

    def loss_rab_ref(rab):
        return hstu_mha_reference(
            N, 0.08, q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32), aux[0], rab=rab,
        ).sum()

    out = jax.jit(lambda r: hstu_attn_varlen_rab(
        q, k, v, r, aux, max_seqlen=N, alpha=0.08, interpret=interp))(rab)
    ref = hstu_mha_reference(
        N, 0.08, q.astype(jnp.float32), k.astype(jnp.float32),
        v.astype(jnp.float32), aux[0], rab=rab)
    aerr, rerr = _maxerr(out, ref)
    results.append({"kernel": "hstu_attn_varlen_rab/fwd",
                    "max_abs_err": aerr, "norm_err": rerr,
                    "pass": rerr < 1.0})
    drab = jax.jit(jax.grad(loss_rab_pallas))(rab)
    drab_ref = jax.grad(loss_rab_ref)(rab)
    aerr, rerr = _maxerr(drab, drab_ref)
    results.append({"kernel": "hstu_attn_varlen_rab/drab",
                    "max_abs_err": aerr, "norm_err": rerr,
                    "pass": rerr < 1.0})


def check_paged(results):
    import jax
    import jax.numpy as jnp

    from recsys_examples_tpu.ops.pallas.paged_hstu_attention import (
        paged_hstu_delta_attention,
        paged_hstu_delta_attention_ref,
    )

    rng = np.random.default_rng(1)
    B, S, H, dh, pg, P, maxp = 4, 16, 2, 128, 16, 64, 8

    def mk(shape):
        return jnp.asarray(
            rng.standard_normal(shape).astype(np.float32) * 0.3,
            jnp.bfloat16,
        )

    q, nk, nv = mk((B, S, H, dh)), mk((B, S, H, dh)), mk((B, S, H, dh))
    kp, vp = mk((P, pg, H, dh)), mk((P, pg, H, dh))
    pt = rng.integers(0, P, (B, maxp)).astype(np.int32)
    clen = np.array([32, 0, 128, 77], np.int32)
    nl = np.array([16, 3, 9, 16], np.int32)
    tensors = (q, kp, vp, jnp.asarray(pt), jnp.asarray(clen), nk, nv,
               jnp.asarray(nl))
    interp = jax.default_backend() != "tpu"
    out = jax.jit(lambda *a: paged_hstu_delta_attention(
        *a, None, 0.08, 256.0, backend="pallas",
        interpret=interp))(*tensors)
    ref = paged_hstu_delta_attention_ref(*tensors, None, 0.08, 256.0)
    aerr, rerr = _maxerr(out, ref)
    results.append({"kernel": "paged_hstu_delta_attention",
                    "max_abs_err": aerr, "norm_err": rerr,
                    "pass": rerr < 1.0})


def check_beam(results):
    import jax
    import jax.numpy as jnp

    from recsys_examples_tpu.ops.pallas.beam_decode_attention import (
        beam_decode_attn,
        beam_decode_attn_ref,
    )

    rng = np.random.default_rng(2)
    B, W, H, Hkv, D, S, Nst = 4, 8, 4, 2, 128, 64, 3

    def mk(shape):
        return jnp.asarray(
            rng.standard_normal(shape).astype(np.float32) * 0.3,
            jnp.bfloat16,
        )

    q = mk((B, W, H, D))
    kc, vc = mk((B, S, Hkv, D)), mk((B, S, Hkv, D))
    clens = jnp.asarray(np.array([64, 17, 33, 5], np.int32))
    kb, vb = mk((B, Nst, W, Hkv, D)), mk((B, Nst, W, Hkv, D))
    anc = jnp.asarray(rng.integers(0, W, (B, Nst, W)).astype(np.int32))
    out = jax.jit(
        lambda *a: beam_decode_attn(
            *a, sm_scale=0.09, backend="pallas",
            interpret=jax.default_backend() != "tpu")
    )(q, kc, vc, clens, kb, vb, anc)
    ref = beam_decode_attn_ref(q, kc, vc, clens, kb, vb, anc, sm_scale=0.09)
    aerr, rerr = _maxerr(out, ref)
    results.append({"kernel": "beam_decode_attn",
                    "max_abs_err": aerr, "norm_err": rerr,
                    "pass": rerr < 1.0})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
            "benchmarks", "results", "pallas_parity.json"),
    )
    args = ap.parse_args()

    import jax

    results = []
    check_varlen(results)
    check_paged(results)
    check_beam(results)
    ok = all(r["pass"] for r in results)
    artifact = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "all_pass": ok,
        "results": results,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"bench": "pallas_parity", "all_pass": ok,
                      "cases": len(results),
                      "backend": jax.default_backend(),
                      "artifact": args.out}))
    if not ok:
        for r in results:
            if not r["pass"]:
                print("FAIL", r, file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
