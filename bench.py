"""Benchmark driver: prints ONE JSON line with the headline metric.

Metric (BASELINE.json): NTTs/sec/chip at n = 2^20, 32-bit prime
(p = 469762049, Harvey lazy butterflies, Pallas four-step engine).

Methodology — the TPU analog of the reference's two metrics (SURVEY.md §6):
- throughput ("kernel-time" analog): device-resident batched transforms,
  K async dispatches drained with one final sync (the reference's 10x
  dispatch loop, src/test.cpp:157-175, with the trimmed-mean reduction of
  plot_exectime.py:27-29). Inputs live on device — production serving
  shape: no host transfer in the timed region.
- a correctness gate: the timed pipeline is verified bit-exact against the
  native C++ golden oracle (the reference's PASS gate,
  src/test.cpp:221-247). Run AFTER timing: on the tunneled axon backend a
  large device->host readback permanently degrades later dispatches.

vs_baseline: normalized butterfly rate vs the reference's best committed
number — 16-tile AIE kernel time 14.375 us at n=2^11 (BASELINE.md §1) =
(2^11/2 * 11) / 14.375us = 0.7836 G butterflies/s. Ours =
(2^20/2 * 20) / t. The ratio is size-normalized since NTT work is
n/2*log2(n) butterflies.
"""

import json
import sys
import time

import numpy as np

REF_BUTTERFLIES_PER_SEC = (2**11 // 2 * 11) / 14.375e-6  # reference best


def main() -> int:
    import jax
    import jax.numpy as jnp

    from ntt_aie_tpu import NTTConfig, P_469762049 as field
    from ntt_aie_tpu import twiddles as tw
    from ntt_aie_tpu.plan import build_plan

    log_n = 20
    n = 1 << log_n
    cfg = NTTConfig(field=field, log_n=log_n)
    on_tpu = jax.default_backend() == "tpu"
    plan = build_plan(cfg, engine="pallas" if on_tpu else "xla")

    rng = np.random.default_rng(0)
    a = rng.integers(0, field.p, n)

    # Bare batched pipeline (no explicit jit wrapper: an explicit-jit pallas
    # dispatch on the axon tunnel also degrades every later dispatch).
    B = 8 if on_tpu else 2
    bat = plan.make_batched(B)
    fwd = bat["fwd"]

    batch_in = np.empty((B, n), dtype=np.uint32)
    batch_in[:] = rng.integers(0, field.p, (B, n))
    batch_in[0] = a
    xs = jnp.asarray(batch_in)

    # ---- throughput (timed before any readback) ----
    fwd(xs).block_until_ready()  # warm

    def run_round(k: int) -> float:
        t0 = time.perf_counter()
        outs = [fwd(xs) for _ in range(k)]
        for o in outs:
            o.block_until_ready()
        return (time.perf_counter() - t0) / (k * B)

    k = 8 if on_tpu else 2
    rounds = sorted(run_round(k) for _ in range(5))
    trimmed = rounds[1:-1]  # reference-style trimmed mean
    sec_per_ntt = float(np.mean(trimmed))
    ntts_per_sec = 1.0 / sec_per_ntt

    our_butterflies = (n // 2) * log_n / sec_per_ntt
    vs_baseline = our_butterflies / REF_BUTTERFLIES_PER_SEC

    # ---- correctness gate (bit-exact vs golden oracle), after timing ----
    flat = np.asarray(fwd(xs))[0]
    try:
        from ntt_aie_tpu import native_oracle as native

        want = np.asarray(
            native.ntt_dif(a.astype(np.uint64), field.root_of_unity(n), field.p)
        )[tw.bit_reverse_indices(n)]
    except Exception:
        from ntt_aie_tpu import reference as ref

        want = ref.ntt_forward(a, field).astype(np.uint64)
    if not np.array_equal(flat[plan.spectral_to_natural].astype(np.uint64), want):
        print(json.dumps({"metric": "NTTs/sec/chip at n=2^20 (32-bit prime)",
                          "value": 0.0, "unit": "NTT/s", "vs_baseline": 0.0,
                          "error": "verification FAILED"}))
        return 1

    print(json.dumps({
        "metric": "NTTs/sec/chip at n=2^20 (32-bit prime)",
        "value": round(ntts_per_sec, 1),
        "unit": "NTT/s",
        "vs_baseline": round(vs_baseline, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
