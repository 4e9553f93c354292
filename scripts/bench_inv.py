"""One-off: time batched inverse NTT and polymul at n=2^20 (real TPU).

Used for before/after ladders on DIT-path changes; prints JSON.
Run: python scripts/bench_inv.py [B]
"""
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ntt_aie_tpu.utils.platform import honor_platform_env
honor_platform_env()  # make JAX_PLATFORMS effective despite sitecustomize

import numpy as np


def main() -> int:
    import jax.numpy as jnp

    from ntt_aie_tpu import NTTConfig, P_469762049 as field
    from ntt_aie_tpu.plan import build_plan
    from ntt_aie_tpu.utils.timing import time_device

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    log_n = 20
    n = 1 << log_n
    cfg = NTTConfig(field=field, log_n=log_n)
    plan = build_plan(cfg, engine="pallas")
    bat = plan.make_batched(B)

    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.integers(0, field.p, (B, n)).astype(np.uint32))
    ys = jnp.asarray(rng.integers(0, field.p, (B, n)).astype(np.uint32))

    out = {"B": B, "log_n": log_n}
    res = time_device(bat["fwd"], xs, iters=10, repeats=5)
    out["fwd_us_per_ntt"] = round(res["us_per_iter"] / B, 1)
    res = time_device(bat["inv"], xs, iters=10, repeats=5)
    out["inv_us_per_ntt"] = round(res["us_per_iter"] / B, 1)
    out["inv_over_fwd"] = round(out["inv_us_per_ntt"] / out["fwd_us_per_ntt"], 3)
    res = time_device(lambda a: bat["polymul"](a, ys), xs, iters=10, repeats=5)
    out["polymul_us_per_poly"] = round(res["us_per_iter"] / B, 1)

    # spot correctness: inv(fwd(x)) == x for lane 0
    rt = np.asarray(bat["inv"](bat["fwd"](xs)))[0]
    out["roundtrip_ok"] = bool(np.array_equal(rt, np.asarray(xs[0])))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    main()
