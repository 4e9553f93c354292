"""Round-5 co-tenancy paired probe (VERDICT r4 #5).

DESIGN.md §2 inferred that most of the headline-vs-ideal gap is chip
co-tenancy (a 30-us traced op can land in an uncontended window while a
seconds-long chain time-shares the partitioned chip) — but the inference
compared numbers from DIFFERENT sessions, the exact trap §3 documents.

This script makes it a measurement: the ideal-conditions VPU probe
(roofline.measure_vpu_peak — the EXACT harvey4 butterfly arithmetic at
zero network overhead) and the headline matrix-form forward chain run
ALTERNATELY in ONE session, several rounds each. If the chained
headline's achieved butterfly rate degrades relative to ITS OWN ideal
measured seconds apart, the gap is kernel slack; if probe and headline
move together (their ratio is stable across rounds and the probe itself
sits below the best-ever ideal), the residue is co-tenancy.

Run: python scripts/bench_cotenancy.py [B] [rounds]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ntt_aie_tpu.utils.platform import honor_platform_env
honor_platform_env()

import numpy as np


def main() -> int:
    import jax.numpy as jnp

    from ntt_aie_tpu import NTTConfig, P_469762049 as field
    from ntt_aie_tpu.plan import build_plan
    from ntt_aie_tpu.profiling.roofline import measure_vpu_peak
    from ntt_aie_tpu.utils.timing import time_device

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    log_n = 20
    cfg = NTTConfig(field=field, log_n=log_n)
    n1, n2 = cfg.split
    n = cfg.n
    bfly_per_ntt = (n // 2) * log_n

    plan = build_plan(cfg, engine="pallas")
    fwd = plan.make_batched(B)["fwd_mat"]
    rng = np.random.default_rng(0)
    x2d = jnp.asarray(rng.integers(0, field.p, (B, n))
                      .astype(np.uint32).reshape(B, n1, n2))

    pairs = []
    for rd in range(rounds):
        ideal = measure_vpu_peak(cache=False, iters=6, repeats=4)
        res = time_device(fwd, x2d, iters=10, repeats=5)
        sec_per_ntt = res["us_per_iter"] * 1e-6 / B
        head_gbf = bfly_per_ntt / sec_per_ntt / 1e9
        row = {
            "round": rd,
            "ideal_gbf": round(ideal["butterflies_per_sec"] / 1e9, 1),
            "headline_gbf": round(head_gbf, 1),
            "headline_ntts_per_sec": round(1.0 / sec_per_ntt, 1),
            "paired_ratio": round(head_gbf * 1e9
                                  / ideal["butterflies_per_sec"], 3),
        }
        pairs.append(row)
        print(json.dumps(row))

    ratios = [p["paired_ratio"] for p in pairs]
    ideals = [p["ideal_gbf"] for p in pairs]
    print(json.dumps({
        "summary": "paired same-session probe",
        "B": B,
        "paired_ratio_mean": round(float(np.mean(ratios)), 3),
        "paired_ratio_spread": round(float(np.max(ratios) - np.min(ratios)),
                                     3),
        "ideal_gbf_range": [min(ideals), max(ideals)],
        "best_ever_ideal_gbf_r4": [221, 273],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
