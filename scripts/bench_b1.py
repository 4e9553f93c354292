"""Round-5 B=1 latency ladder (VERDICT r4 #6).

The committed B=1 trace shows pass 2 HBM-bound at 79% of calibrated HBM
on wmat table traffic (trace_v5e_logn20.json derived planes); factored
tables cut those bytes ~16x and the fold moves them to pass 1's HBM
headroom — but the only factored A/B was at B=64 where the batch grid
amortizes tables and it measured a wash. This ladder measures the B=1
regime properly: {full, factored, fold} x {flat, matrix-form} single
transforms.

Methodology: a K-deep dependent chain INSIDE one jit (lax.fori_loop) —
at B=1 the per-dispatch enqueue cost (~0.7-1.5 ms through the tunnel)
exceeds the ~30-130 us of device work, so an eager chain would measure
the host, not the chip. One jitted dispatch runs K transforms
back-to-back on device; time_device's readback fence then divides by
iters*K. fwd_mat chains need n1 == n2 (true at 2^20 and 2^24).

Run: python scripts/bench_b1.py [log_n] [K]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ntt_aie_tpu.utils.platform import honor_platform_env
honor_platform_env()

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from ntt_aie_tpu import NTTConfig, P_469762049 as field
    from ntt_aie_tpu.plan import build_plan
    from ntt_aie_tpu.utils.timing import time_device

    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cfg = NTTConfig(field=field, log_n=log_n)
    n1, n2 = cfg.split
    assert n1 == n2, "fwd/fwd_mat chaining needs a square split"
    n = cfg.n
    rng = np.random.default_rng(0)
    a = rng.integers(0, field.p, n).astype(np.uint32)

    plans = {}
    for name, kw in (("full", {"wmat_fold": False}),
                     ("factored", {"wmat_factored": True}),
                     ("fold", {"wmat_fold": True})):
        try:
            plans[name] = build_plan(cfg, engine="pallas", **kw)
        except Exception as e:  # noqa: BLE001 — report, keep other arms
            print(json.dumps({"arm": name, "error": f"{type(e).__name__}: {e}"}))

    def chain_k(fn):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, K, lambda i, v: fn(v), x)

        return run

    # cross-arm bit-exactness on the single transform first
    want = None
    for name, plan in plans.items():
        got = np.asarray(plan.fwd(jnp.asarray(a)))
        if want is None:
            want = got
        assert np.array_equal(got, want), f"{name} fwd != full fwd"
    print(json.dumps({"probe": "bitexact", "ok": True, "log_n": log_n,
                      "arms": sorted(plans), "K": K}))

    xs_flat = jnp.asarray(a)
    xs_mat = jnp.asarray(a.reshape(n1, n2))
    for name, plan in plans.items():
        for layout, fn, x0 in (("flat", plan.fwd, xs_flat),
                               ("mat", plan.fwd_mat, xs_mat)):
            try:
                run = chain_k(fn)
                res = time_device(run, x0, iters=2, repeats=5)
                us = res["us_per_iter"] / K
                print(json.dumps({"arm": name, "layout": layout,
                                  "us_per_ntt": round(us, 1),
                                  "ntts_per_sec": round(1e6 / us, 1)}))
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"arm": name, "layout": layout,
                                  "error": f"{type(e).__name__}: {e}"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
