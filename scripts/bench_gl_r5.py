"""Round-5 Goldilocks re-measurement (VERDICT r4 #1), one session.

The committed GL headline (1,009 NTT/s at n=2^20) predates the round-4
nested column networks (+48% on the 32-bit headline; the GL nested fuse
rescan showed parts-DIT f5 at -17%/pass) and the matrix-form serving
layout (+35% on 32-bit; GL moves 2x the bytes per boundary). This
script takes, in ONE session:

  1. GL end-to-end fwd/inv/polymul under the CURRENT kernels (flat
     contract, B as given — the committed-number shape),
  2. the GL matrix-form vs flat A/B (fwd_mat/inv_mat/polymul_mat),
  3. the GL factored-vs-full A/B on the current kernels,
with device bit-exactness checks between every pair of arms and a host
uint64-oracle gate on the forward output.

Run: python scripts/bench_gl_r5.py [B] [log_n]
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

    full = build_goldilocks_plan(cfg, engine="pallas")
    fac = build_goldilocks_plan(cfg, engine="pallas", wmat_factored=True)
    fb = full.make_batched(B)
    xb = fac.make_batched(B)

    # device-resident operands (limb pairs): flat and matrix layouts
    a_flat = tuple(jnp.asarray(v) for v in M.gl_from_u64(vals))
    a_mat = tuple(jnp.asarray(v.reshape(B, n1, n2))
                  for v in M.gl_from_u64(vals))

    # ---- correctness gates (before timing; readback row sample) ----
    got = np.asarray(M.gl_to_u64(*(np.asarray(z) for z in
                                   fb["fwd"](a_flat))))
    # native C++ golden oracle on row 0 (bench.py's gate pattern; the
    # 128-bit mulmod path covers Goldilocks)
    from ntt_aie_tpu import native_oracle as native
    from ntt_aie_tpu import twiddles as tw

    brev = tw.bit_reverse_indices(n)
    want0 = native.ntt_dif(vals[0], field.root_of_unity(n), field.p)[brev]
    assert np.array_equal(got[0][full.spectral_to_natural], want0), \
        "native oracle gate FAILED"
    gm = np.asarray(M.gl_to_u64(*(np.asarray(z)[:2] for z in
                                  fb["fwd_mat"](a_mat))))
    assert np.array_equal(gm.reshape(2, n), got[:2]), "mat != flat"
    gx = np.asarray(M.gl_to_u64(*(np.asarray(z)[:2] for z in
                                  xb["fwd"](a_flat))))
    assert np.array_equal(gx, got[:2]), "factored != full"
    back = np.asarray(M.gl_to_u64(*(np.asarray(z)[:2] for z in
                                    fb["inv"](fb["fwd"](a_flat)))))
    assert np.array_equal(back, vals[:2]), "roundtrip failed"
    print(json.dumps({"probe": "gates", "ok": True, "B": B,
                      "log_n": log_n}))

    rows = []

    def bench(tag, fn, x0, iters=4, per="us_per_ntt"):
        res = time_device(fn, x0, iters=iters, repeats=4)
        us = res["us_per_iter"] / B
        row = {"arm": tag, per: round(us, 1),
               "per_sec": round(1e6 / us, 1)}
        rows.append(row)
        print(json.dumps(row))

    # 1. end-to-end flat (the committed-number shape) — full-matrix mode
    bench("full/flat/fwd", fb["fwd"], a_flat)
    si = fb["fwd"](a_flat)
    bench("full/flat/inv", fb["inv"], tuple(jnp.asarray(np.asarray(z))
                                            for z in si))
    # 2. matrix-form A/B
    bench("full/mat/fwd", fb["fwd_mat"], a_mat)
    sim = fb["fwd_mat"](a_mat)
    bench("full/mat/inv", fb["inv_mat"], tuple(jnp.asarray(np.asarray(z))
                                               for z in sim))
    bench("full/mat/polymul", lambda v: fb["polymul_mat"](v, v), a_mat,
          iters=2, per="us_per_poly")
    bench("full/flat/polymul", lambda v: fb["polymul"](v, v), a_flat,
          iters=2, per="us_per_poly")
    # 3. factored A/B (current kernels)
    bench("fac/flat/fwd", xb["fwd"], a_flat)
    bench("fac/mat/fwd", xb["fwd_mat"], a_mat)
    sif = xb["fwd"](a_flat)
    bench("fac/flat/inv", xb["inv"], tuple(jnp.asarray(np.asarray(z))
                                           for z in sif))
    # drift bound: re-measure the first arm
    bench("full/flat/fwd2", fb["fwd"], a_flat)
    return 0


if __name__ == "__main__":
    sys.exit(main())
