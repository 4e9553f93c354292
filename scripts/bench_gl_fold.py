"""GL wmat_fold A/B (round 5): entry placement vs the 'post_t' fold on
the real chip, ONE session, interleaved twice per arm, matrix-form
callables (the serving layout). Decides whether GL follows the 32-bit
plan's fold default (which rests on its own never-worse A/B).

Run: python scripts/bench_gl_fold.py [B] [log_n]
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

    from ntt_aie_tpu import NTTConfig, GOLDILOCKS as field
    from ntt_aie_tpu.goldilocks_plan import build_goldilocks_plan
    from ntt_aie_tpu.ops import modops as M
    from ntt_aie_tpu.utils.timing import time_device

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    log_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    cfg = NTTConfig(field=field, log_n=log_n)
    n1, n2 = cfg.split
    n = cfg.n
    rng = np.random.default_rng(0)
    vals = (rng.integers(0, 1 << 63, (B, n), dtype=np.uint64)
            % np.uint64(field.p))
    a_mat = tuple(jnp.asarray(v.reshape(B, n1, n2))
                  for v in M.gl_from_u64(vals))

    base = build_goldilocks_plan(cfg, engine="pallas",
                                 wmat_fold=False).make_batched(B)
    fold = build_goldilocks_plan(cfg, engine="pallas",
                                 wmat_fold=True).make_batched(B)

    gb = np.asarray(M.gl_to_u64(*(np.asarray(z)[:2] for z in
                                  base["fwd_mat"](a_mat))))
    gf = np.asarray(M.gl_to_u64(*(np.asarray(z)[:2] for z in
                                  fold["fwd_mat"](a_mat))))
    assert np.array_equal(gb, gf), "fold != base on device"
    si = {"base": tuple(jnp.asarray(np.asarray(z))
                        for z in base["fwd_mat"](a_mat)),
          "fold": tuple(jnp.asarray(np.asarray(z))
                        for z in fold["fwd_mat"](a_mat))}
    back = np.asarray(M.gl_to_u64(*(np.asarray(z)[:2] for z in
                                    fold["inv_mat"](si["fold"]))))
    assert np.array_equal(back.reshape(2, n), vals[:2]), "roundtrip failed"
    print(json.dumps({"probe": "gates", "ok": True, "B": B,
                      "log_n": log_n}))

    seq = [("base/fwd", base["fwd_mat"], a_mat),
           ("fold/fwd", fold["fwd_mat"], a_mat),
           ("base/fwd2", base["fwd_mat"], a_mat),
           ("fold/fwd2", fold["fwd_mat"], a_mat),
           ("base/inv", base["inv_mat"], si["base"]),
           ("fold/inv", fold["inv_mat"], si["fold"]),
           ("base/inv2", base["inv_mat"], si["base"]),
           ("fold/inv2", fold["inv_mat"], si["fold"])]
    for tag, fn, x0 in seq:
        try:
            res = time_device(fn, x0, iters=4, repeats=4)
            us = res["us_per_iter"] / B
            print(json.dumps({"arm": tag, "us_per_ntt": round(us, 1),
                              "per_sec": round(1e6 / us, 1)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"arm": tag,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
