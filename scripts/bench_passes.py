"""Round-4 per-pass localization: where do the cycles go vs the measured
ideal butterfly rate (measure_vpu_peak ~221 Gbf/s, 2026-08-19)?

Times each batched colpass of the headline plan separately on the real
chip and reports achieved G butterflies/s per pass. Run:
    python scripts/bench_passes.py [B]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ntt_aie_tpu import NTTConfig, P_469762049 as field
    from ntt_aie_tpu import twiddles as tw
    from ntt_aie_tpu.ops import pallas_ntt as PN
    from ntt_aie_tpu.profiling import roofline
    from ntt_aie_tpu.utils.timing import time_device

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    log_n = 20
    n = 1 << log_n
    n1 = n2 = 1 << (log_n // 2)
    kind = "harvey4"
    rng = np.random.default_rng(0)

    ideal = roofline.measure_vpu_peak(iters=6, repeats=4)
    print(json.dumps({"probe": "ideal", **{k: round(v, 2) if isinstance(v, float) else v
                                           for k, v in ideal.items()}}))
    peak = ideal["butterflies_per_sec"]

    tabs = tw.fourstep_tables(field, n1, n2)
    wmat, iwmat = tabs["wmat"], tabs["iwmat_scaled"]
    kw = dict(reduction=kind, batch=B)
    passes = {
        "cp1 (dif + transpose-out)": PN.make_colpass(
            field, n1, n2, direction="dif", transpose_out=True, **kw),
        "cp2 (dif + wmat-pre + canon)": PN.make_colpass(
            field, n2, n1, direction="dif", wmat=np.ascontiguousarray(wmat.T),
            twiddle_pos="pre", canonicalize=True, **kw),
        "cp2-notw (dif + canon)": PN.make_colpass(
            field, n2, n1, direction="dif", canonicalize=True, **kw),
        "cp1-plain (dif only)": PN.make_colpass(
            field, n1, n2, direction="dif", **kw),
        "icp2 (dit + transpose-out)": PN.make_colpass(
            field, n2, n1, direction="dit", inverse_tw=True,
            transpose_out=True, **kw),
        "icp1 (dit + iwmat-pre + canon)": PN.make_colpass(
            field, n1, n2, direction="dit", inverse_tw=True, wmat=iwmat,
            twiddle_pos="pre", canonicalize=True, **kw),
    }
    x = jnp.asarray(rng.integers(0, field.p, (B, n1, n2)).astype(np.uint32))
    bf_per_call = B * (n // 2) * (log_n // 2)  # one pass = half the stages
    for name, fn in passes.items():
        wrap = (lambda f: (lambda v: f(v).reshape(B, n1, n2)))(fn)
        res = time_device(wrap, x, iters=6, repeats=4)
        gbf = bf_per_call / (res["us_per_iter"] * 1e-6) / 1e9
        print(json.dumps({"pass": name, "us_per_iter": round(res["us_per_iter"], 1),
                          "us_per_ntt_component": round(res["us_per_iter"] / B, 2),
                          "gbf_per_sec": round(gbf, 1),
                          "pct_of_ideal": round(100 * gbf * 1e9 / peak, 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
