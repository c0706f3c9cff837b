"""Analytic FLOPs / MFU model for HSTU training.

Counterpart of the reference's perf model (examples/commons/utils/perf.py:540
`cal_hstu_flops_single_rank`, :601 `cal_hstu_flops`, :467 `cal_mfu`): exact
jagged attention FLOPs from per-batch sequence lengths + dense GEMM FLOPs,
divided by device peak.
"""
from __future__ import annotations

import dataclasses

import numpy as np

# bf16 dense peak TFLOPS per chip
TPU_PEAK_TFLOPS = {
    "v4": 275.0 / 2,      # 275 bf16? v4: 275 TFLOPS bf16 per chip
    "v5e": 197.0,
    "v5p": 459.0,
    "v6e": 918.0,
}


def device_peak_tflops() -> float:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind:
        return TPU_PEAK_TFLOPS["v5e"]
    if "v6" in kind:
        return TPU_PEAK_TFLOPS["v6e"]
    if "v5p" in kind or "v5" in kind:
        return TPU_PEAK_TFLOPS["v5p"]
    if "v4" in kind:
        return TPU_PEAK_TFLOPS["v4"]
    return 197.0


def hstu_train_flops(
    seqlens: np.ndarray,       # [B] preprocessed sequence lengths (tokens)
    hidden_size: int,
    num_heads: int,
    head_dim: int,
    num_layers: int,
    *,
    causal: bool = True,
    fwd_only: bool = False,
) -> float:
    """Total FLOPs of the HSTU block for one batch (fwd+bwd unless fwd_only).

    Per layer per sequence of n tokens:
      uvqk GEMM: 2 * n * D * 4*H*dh
      attention: qk + pv = 2 * 2 * H * dh * n^2 ( /2 if causal)
      out proj:  2 * n * H*dh * D
    Backward ~ 2x forward (dgrad+wgrad for GEMMs; dq,dk,dv for attention).
    """
    n = seqlens.astype(np.float64)
    D = hidden_size
    Hdh = num_heads * head_dim
    gemm = 2.0 * n * D * 4 * Hdh + 2.0 * n * Hdh * D
    att = 2.0 * 2.0 * Hdh * (n ** 2) * (0.5 if causal else 1.0)
    fwd = (gemm + att).sum() * num_layers
    return float(fwd if fwd_only else 3.0 * fwd)
