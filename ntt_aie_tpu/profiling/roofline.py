"""Cost models and efficiency reporting.

The reference's efficiency pipeline (profile/plot_efficiency.py:25-46) is
``achieved = 5.5*N*log2(N) / kernel_time`` against fixed peaks (88 GOPS for
the 16-tile AIE, 4280 GFLOPS for the A100). Both models carry over:

- the *op* model ``5.5 * n * log2(n)`` (kept verbatim so efficiency numbers
  are comparable with the reference's plots), and
- an *HBM* model, which is the binding roofline on TPU: a fused four-step
  pass streams the whole array HBM->VMEM->HBM once, so a forward transform
  moves ~4 * n * itemsize bytes (2 passes x read+write). Large-N NTT is
  bandwidth-bound — compute efficiency vs the vector unit would understate
  how close to speed-of-light the kernel runs.

Peaks are looked up by ``jax.devices()[0].device_kind`` from public spec
sheets; unknown devices report None and efficiency fields are omitted.
"""

from __future__ import annotations

import math
from typing import Optional

# Public spec-sheet numbers: (HBM GB/s, bf16 TFLOP/s). The vector-unit int32
# path has no published peak; HBM is the relevant roofline for NTT anyway.
_DEVICE_PEAKS = {
    "TPU v4": (1228.0, 275.0),
    "TPU v5 lite": (819.0, 197.0),   # v5e
    "TPU v5e": (819.0, 197.0),
    "TPU v5p": (2765.0, 459.0),
    "TPU v6 lite": (1640.0, 918.0),  # v6e / Trillium
    "TPU v6e": (1640.0, 918.0),
    "TPU v7": (7370.0, 2307.0),      # Ironwood, per-chip
}


def butterflies(n: int) -> int:
    """Total radix-2 butterflies in one size-n transform: n/2 * log2(n)."""
    return (n // 2) * int(math.log2(n))


def model_ops(n: int) -> float:
    """The reference's FLOP model (profile/plot_efficiency.py:25): 5.5 ops
    per element-stage — 5.5 * n * log2(n)."""
    return 5.5 * n * math.log2(n)


def bytes_per_transform(n: int, *, passes: int = 2, itemsize: int = 4) -> int:
    """HBM traffic model for a fused four-step transform: each pass reads and
    writes the full array once (twiddle tables add < 3% and are ignored)."""
    return passes * 2 * n * itemsize


def device_peaks(device_kind: Optional[str] = None) -> dict:
    """(hbm_gbps, bf16_tflops) for the current or named device kind."""
    if device_kind is None:
        import jax

        device_kind = jax.devices()[0].device_kind
    hbm, tflops = _DEVICE_PEAKS.get(device_kind, (None, None))
    return {"device_kind": device_kind, "hbm_gbps": hbm, "bf16_tflops": tflops}


def efficiency_report(seconds_per_transform: float, n: int, *,
                      device_kind: Optional[str] = None,
                      passes: int = 2, itemsize: int = 4) -> dict:
    """Everything the reference's three plots derive, as one dict:
    throughput, butterfly rate, model GOPS (the 5.5 model), achieved HBM
    bandwidth, and efficiency vs the HBM roofline when the peak is known."""
    t = seconds_per_transform
    rep = {
        "n": n,
        "us_per_transform": t * 1e6,
        "transforms_per_sec": 1.0 / t,
        "butterflies_per_sec": butterflies(n) / t,
        "model_gops": model_ops(n) / t / 1e9,
        "hbm_bytes": bytes_per_transform(n, passes=passes, itemsize=itemsize),
        "achieved_gbps": bytes_per_transform(n, passes=passes, itemsize=itemsize) / t / 1e9,
    }
    peaks = device_peaks(device_kind)
    rep.update(peaks)
    if peaks["hbm_gbps"]:
        rep["hbm_efficiency"] = rep["achieved_gbps"] / peaks["hbm_gbps"]
    return rep
