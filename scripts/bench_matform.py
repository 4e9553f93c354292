"""A/B: flat (B, n) entry vs matrix-form (B, n1, n2) entry for the
batched forward pipeline (real TPU).

The committed traces show the flat contract pays a physical retile on
TPU at each boundary (1D->2D is a tiling change, not a view): at n=2^24
B=1 the copy+reshape pair is 29% of device time (profile/trace/
trace_v5e_logn24.json), ~12% at n=2^20. The column passes themselves
chain 2D->2D, so a matrix-form entry skips both retiles.

Run: python scripts/bench_matform.py [B] [log_n]
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
    from ntt_aie_tpu.ops import pallas_ntt as PN
    from ntt_aie_tpu import twiddles as tw
    from ntt_aie_tpu.plan import build_plan
    from ntt_aie_tpu.utils.timing import time_device

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    log_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    n = 1 << log_n
    cfg = NTTConfig(field=field, log_n=log_n)
    n1, n2 = cfg.split
    plan = build_plan(cfg, engine="pallas")
    bat = plan.make_batched(B)

    rng = np.random.default_rng(0)
    flat = rng.integers(0, field.p, (B, n)).astype(np.uint32)
    xs = jnp.asarray(flat)
    x2d = jnp.asarray(flat.reshape(B, n1, n2))

    out = {"B": B, "log_n": log_n}
    res = time_device(bat["fwd"], xs, iters=10, repeats=5)
    out["flat_us_per_ntt"] = round(res["us_per_iter"] / B, 2)

    # Matrix-form pipeline: same two batched passes, no entry/exit reshape.
    kind = plan.reduction
    tabs = tw.fourstep_tables(field, n1, n2)
    kw = dict(reduction=kind, batch=B)
    cp1 = PN.make_colpass(field, n1, n2, direction="dif",
                          transpose_out=True, **kw)
    cp2 = PN.make_colpass(field, n2, n1, direction="dif",
                          wmat=np.ascontiguousarray(tabs["wmat"].T),
                          twiddle_pos="pre", canonicalize=True, **kw)

    def fwd2d(x):
        return cp2(cp1(x))

    # correctness: bit-identical to the flat path (readback a 4-row slice
    # only — full B x n arrays cost ~minutes through the ~18 MB/s tunnel;
    # bench.py's native-oracle gate covers the full output elsewhere)
    y2d = np.asarray(fwd2d(x2d)[:4])
    yflat = np.asarray(bat["fwd"](xs)[:4])
    out["bit_identical_4rows"] = bool(
        np.array_equal(y2d.reshape(4, n), yflat))

    res = time_device(fwd2d, x2d, iters=10, repeats=5)
    out["mat_us_per_ntt"] = round(res["us_per_iter"] / B, 2)
    out["mat_over_flat"] = round(out["mat_us_per_ntt"]
                                 / out["flat_us_per_ntt"], 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
