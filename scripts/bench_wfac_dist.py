"""Distributed factored-twiddle A/B + hardware proof at D=1, real TPU.

Builds build_distributed_plan on a one-device TPU mesh (trivial
collectives — this is the shard_map+Mosaic hardware proof for the
factored path) in full-matrix and factored modes, checks bit-exactness
between them and the roundtrip, and times fwd/inv.
Run: python scripts/bench_wfac_dist.py [log_n]
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
    import jax
    import jax.numpy as jnp

    from ntt_aie_tpu import NTTConfig, P_469762049 as field
    from ntt_aie_tpu.parallel.fourstep import build_distributed_plan
    from ntt_aie_tpu.parallel.mesh import make_mesh
    from ntt_aie_tpu.utils.timing import time_device

    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cfg = NTTConfig(field=field, log_n=log_n, rows_log2=log_n // 2,
                    num_shards=1)
    mesh = make_mesh(1)
    rng = np.random.default_rng(0)
    a = rng.integers(0, field.p, cfg.n)

    ref_out = None
    interp = jax.default_backend() != "tpu"  # CPU smoke runs interpret mode
    for mode in (False, True):
        plan = build_distributed_plan(cfg, mesh, engine="pallas",
                                      interpret=interp, wmat_factored=mode)
        x = plan.shard_input(a)
        out = {"mode": "factored" if mode else "full", "log_n": log_n,
               "D": 1, "engine": "pallas+shard_map",
               "backend": jax.default_backend()}
        got = np.asarray(plan.fwd(x))
        if ref_out is None:
            ref_out = got
        else:
            out["bit_exact_vs_full"] = bool(np.array_equal(got, ref_out))
        back = np.asarray(plan.inv(jnp.asarray(got, dtype=jnp.uint32)))
        out["roundtrip_ok"] = bool(np.array_equal(back.reshape(-1), a))
        res = time_device(plan.fwd, x, iters=10, repeats=5)
        out["fwd_us_per_ntt"] = round(res["us_per_iter"], 1)
        res = time_device(plan.inv, jnp.asarray(got, dtype=jnp.uint32),
                          iters=10, repeats=5)
        out["inv_us_per_ntt"] = round(res["us_per_iter"], 1)
        print(json.dumps(out))
    return 0


if __name__ == "__main__":
    main()
