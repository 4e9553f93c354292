"""Round-4 Goldilocks factored-twiddle A/B on the real chip.

Measures (1) plan-setup wall time full vs factored (table build + kernel
construction; the round-3 finding was a 3.3 s object-array GL table build
at n=2^22 — round 4 also replaced the object math with a vectorized
uint64 limb mulmod, so both modes should drop), and (2) device
throughput fwd/inv full vs factored at B, with a bit-exactness check
between the modes' outputs.

Run: python scripts/bench_gl_wfac.py [log_n] [B]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ntt_aie_tpu.utils.platform import honor_platform_env
honor_platform_env()

import numpy as np


def main():
    import jax

    from ntt_aie_tpu import NTTConfig, GOLDILOCKS as field
    from ntt_aie_tpu import twiddles as tw
    from ntt_aie_tpu.goldilocks_plan import build_goldilocks_plan
    from ntt_aie_tpu.ops import modops as M
    from ntt_aie_tpu.utils.timing import time_device

    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cfg = NTTConfig(field=field, log_n=log_n)
    n = cfg.n
    rng = np.random.default_rng(0)
    vals = (rng.integers(0, 1 << 63, (B, n), dtype=np.uint64)
            % np.uint64(field.p))

    # ---- setup-time A/B (cold table caches) ----
    tw._FOURSTEP_MEMO.clear()
    t0 = time.perf_counter()
    full = build_goldilocks_plan(cfg, engine="pallas", wmat_factored=False)
    full_b = full.make_batched(B)
    t_full = time.perf_counter() - t0
    tw._FOURSTEP_MEMO.clear()
    t0 = time.perf_counter()
    fac = build_goldilocks_plan(cfg, engine="pallas", wmat_factored=True)
    fac_b = fac.make_batched(B)
    t_fac = time.perf_counter() - t0
    print(json.dumps({"probe": "setup_s", "full": round(t_full, 2),
                      "factored": round(t_fac, 2), "log_n": log_n}))

    a = M.gl_from_u64(vals)

    # bit-exactness between modes on the real device (row sample)
    gf = np.asarray(M.gl_to_u64(*full_b["fwd"](a)))
    gx = np.asarray(M.gl_to_u64(*fac_b["fwd"](a)))
    assert np.array_equal(gf, gx), "factored != full on device"
    back = np.asarray(M.gl_to_u64(*fac_b["inv"](M.gl_from_u64(gx))))
    assert np.array_equal(back, vals), "factored roundtrip failed"
    print(json.dumps({"probe": "bitexact", "ok": True}))

    for name, fns in (("full", full_b), ("factored", fac_b)):
        for op in ("fwd", "inv"):
            fn = fns[op]
            res = time_device(lambda hl: fn(hl), a, iters=4, repeats=4)
            us = res["us_per_iter"] / B
            print(json.dumps({"mode": name, "op": op,
                              "us_per_ntt": round(us, 1),
                              "ntts_per_sec": round(1e6 / us, 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
