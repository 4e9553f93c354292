"""Benchmark driver: prints ONE JSON line with the headline metric.

Metric (BASELINE.json): NTTs/sec/chip at n = 2^20, 32-bit prime
(p = 469762049, Harvey lazy butterflies, Pallas four-step engine).

Methodology — the TPU analog of the reference's two metrics (SURVEY.md §6):
a dependent dispatch chain (each transform consumes the previous output, so
no work can be elided), timed end to end behind a *readback fence* and
divided by the chain length. The readback fence matters: on the tunneled
axon backend, block_until_ready returns before device execution completes
(timing an "async stream" with it implied 14 TB/s of HBM traffic on an
819 GB/s chip). A tiny device_get slice of the final output is the only
wait that provably covers execution; its latency amortizes over the chain.
Repeats are reduced with the reference's trimmed mean (drop min and max,
profile/plot_exectime.py:27-29). Batching (B=128) amortizes per-dispatch
cost and is the production serving shape; inputs live on device — no host
transfer in the timed region. B=256 measured ~7.5% faster than B=128
(139.2 vs 161.1 us/NTT back-to-back in one session); B>=384 ran into
memory/time limits on the partitioned chip.

Layout: the timed callable is the MATRIX-FORM forward (`fwd_mat`,
(B, n1, n2) natural-layout -> (B, n2, n1) spectral) — the device-resident
serving layout. On TPU the flat (B, n) boundary is a physical retile of
the lane axis costing ~30% of the chained pipeline (measured A/B,
scripts/bench_matform.py; DESIGN.md §3); a serving pipeline keeps
polynomials in the transform's natural tiling between ops, exactly as the
reference's AIE keeps them in its tile-local layout between kernels. The
flat-contract number is reported alongside as `flat_value`.

Correctness gate: the timed pipeline's output is verified bit-exact against
the native C++ golden oracle (the reference's PASS gate,
src/test.cpp:221-247), run AFTER timing.

vs_baseline: normalized butterfly rate vs the reference's best committed
number — 16-tile AIE kernel time 14.375 us at n=2^11 (BASELINE.md §1) =
(2^11/2 * 11) / 14.375us = 0.7836 G butterflies/s. Ours =
(2^20/2 * 20) / t. The ratio is size-normalized since NTT work is
n/2*log2(n) butterflies.
"""

import json
import os
import sys
import threading

import numpy as np

REF_BUTTERFLIES_PER_SEC = (2**11 // 2 * 11) / 14.375e-6  # reference best


def _acquire_backend(timeout_s: float):
    """Initialize the jax backend with a deadline. The tunneled TPU backend
    can block indefinitely when the tunnel is down; a hung bench emits no
    JSON line at all, so fail loudly instead (the init runs in a daemon
    thread — if it never returns, the process can still exit)."""
    out = {}

    def work():
        try:
            import jax

            out["backend"] = jax.default_backend()
        except Exception as e:  # noqa: BLE001 — report, don't hang
            out["error"] = f"{type(e).__name__}: {e}"

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        return None, f"jax backend init exceeded {timeout_s:.0f}s (tunnel down?)"
    return out.get("backend"), out.get("error")


def main() -> int:
    backend, err = _acquire_backend(
        float(os.environ.get("NTT_BENCH_DEVICE_TIMEOUT_S", "900")))
    if backend is None:
        print(json.dumps({"metric": "NTTs/sec/chip at n=2^20 (32-bit prime)",
                          "value": 0.0, "unit": "NTT/s", "vs_baseline": 0.0,
                          "error": err}))
        return 1

    import jax
    import jax.numpy as jnp

    from ntt_aie_tpu import NTTConfig, P_469762049 as field
    from ntt_aie_tpu import twiddles as tw
    from ntt_aie_tpu.plan import build_plan
    from ntt_aie_tpu.utils.timing import time_device

    log_n = 20
    n = 1 << log_n
    cfg = NTTConfig(field=field, log_n=log_n)
    on_tpu = backend == "tpu"
    plan = build_plan(cfg, engine="pallas" if on_tpu else "xla")

    rng = np.random.default_rng(0)
    a = rng.integers(0, field.p, n)

    B = 256 if on_tpu else 2
    bat = plan.make_batched(B)
    n1, n2 = cfg.split
    fwd_mat = bat.get("fwd_mat")

    batch_in = np.empty((B, n), dtype=np.uint32)
    batch_in[:] = rng.integers(0, field.p, (B, n))
    batch_in[0] = a

    iters = 10 if on_tpu else 3
    flat_res = time_device(bat["fwd"], jnp.asarray(batch_in),
                           iters=iters, repeats=5)
    if fwd_mat is not None and n1 == n2:
        # headline: matrix-form serving layout (time_device chains output
        # into input, so it needs n1 == n2 — true at the 1024x1024 n=2^20
        # headline shape)
        xs = jnp.asarray(batch_in.reshape(B, n1, n2))
        res = time_device(fwd_mat, xs, iters=iters, repeats=5)
        fwd = fwd_mat
    else:
        xs = jnp.asarray(batch_in)
        res, fwd = flat_res, bat["fwd"]
    sec_per_ntt = res["us_per_iter"] * 1e-6 / B
    ntts_per_sec = 1.0 / sec_per_ntt

    our_butterflies = (n // 2) * log_n / sec_per_ntt
    vs_baseline = our_butterflies / REF_BUTTERFLIES_PER_SEC

    # ---- correctness gate (bit-exact vs golden oracle), after timing ----
    # Every gated row is element-compared, like the reference's full-output
    # check (src/test.cpp:221-247): row 0 plus 8 randomly drawn rows of the
    # timed batch, against the native batch oracle (oracle.cc
    # ntt_dif_u64_batch) in one C call.
    gate_rows = np.concatenate(
        [[0], rng.choice(np.arange(1, B), size=min(8, B - 1), replace=False)])
    got = np.asarray(fwd(xs)).reshape(B, n)[gate_rows]
    brev = tw.bit_reverse_indices(n)
    try:
        from ntt_aie_tpu import native_oracle as native

        want = native.ntt_dif_batch(
            batch_in[gate_rows].astype(np.uint64),
            field.root_of_unity(n), field.p)[:, brev]
    except Exception:
        from ntt_aie_tpu import reference as ref

        want = np.stack([ref.ntt_forward(batch_in[r], field) for r in
                         gate_rows]).astype(np.uint64)
    if not np.array_equal(
            got[:, plan.spectral_to_natural].astype(np.uint64), want):
        print(json.dumps({"metric": "NTTs/sec/chip at n=2^20 (32-bit prime)",
                          "value": 0.0, "unit": "NTT/s", "vs_baseline": 0.0,
                          "error": "verification FAILED"}))
        return 1

    # The layout rides the metric NAME so same-named values stay
    # comparable across rounds (rounds <= 3 timed the flat contract under
    # the unqualified string; the matrix-form number is a different
    # contract and says so — ADVICE r4).
    mat_timed = fwd is not bat["fwd"]
    metric = "NTTs/sec/chip at n=2^20 (32-bit prime)"
    if mat_timed:
        metric += ", matrix-form serving layout"
    line = {
        "metric": metric,
        "value": round(ntts_per_sec, 1),
        "unit": "NTT/s",
        "vs_baseline": round(vs_baseline, 1),
    }
    if mat_timed:
        line["layout"] = "matrix-form (device-resident serving layout)"
        line["flat_value"] = round(B / (flat_res["us_per_iter"] * 1e-6), 1)
    print(json.dumps(line))
    return 0


if __name__ == "__main__":
    sys.exit(main())
