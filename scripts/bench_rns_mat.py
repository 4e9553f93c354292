"""Round-5 RNS matrix-form routing A/B (VERDICT r4 #3 'measured delta').

RNSPolymul routes single-chip Pallas residue products through
polymul_mat (residues travel as (B, n1, n2) matrices; no flat-boundary
retiles). The timed quantity is the DEVICE-side 3-prime residue-product
stage (the part the routing changes) on device-resident residues,
mat-layout vs flat-layout, interleaved in one session via dependent
chains (a polymul output is a legal residue input, so the chain feeds
each product back as both operands). Host-encode/upload walls are NOT
timed — through this tunnel they are link-bound (~18 MB/s; a first
draft of this script measured 68 s/call of pure transfer) and identical
between routings.

The device CRT combine is layout-agnostic (elementwise); its cost is
unchanged by the routing and not re-timed here.

Run: python scripts/bench_rns_mat.py [B] [log_n]
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

    from ntt_aie_tpu.rns import RNSPolymul
    from ntt_aie_tpu.utils.timing import time_device

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    log_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    n = 1 << log_n
    rns = RNSPolymul(log_n=log_n)
    k = len(rns.fields)
    rng = np.random.default_rng(0)
    res_flat = [jnp.asarray(rng.integers(0, f.p, (B, n)).astype(np.uint32))
                for f in rns.fields]
    splits = [p.config.split for p in rns.plans]
    res_mat = [jnp.asarray(np.asarray(r).reshape(B, s[0], s[1]))
               for r, s in zip(res_flat, splits)]

    bats = [p.make_batched(B) for p in rns.plans]
    fns_flat = [bat["polymul"] for bat in bats]
    fns_mat = [bat["polymul_mat"] for bat in bats]

    def chain(fns):
        def run(vs):
            return tuple(fn(v, v) for fn, v in zip(fns, vs))

        return run

    # cross-layout bit-exactness on the first product
    got_m = np.asarray(fns_mat[0](res_mat[0], res_mat[0]))
    got_f = np.asarray(fns_flat[0](res_flat[0], res_flat[0]))
    assert np.array_equal(got_m.reshape(B, n), got_f), "mat != flat"
    print(json.dumps({"probe": "bitexact", "ok": True, "B": B,
                      "log_n": log_n, "k": k}))

    for tag, fns, x0 in (("mat", fns_mat, tuple(res_mat)),
                         ("flat", fns_flat, tuple(res_flat)),
                         ("mat2", fns_mat, tuple(res_mat)),
                         ("flat2", fns_flat, tuple(res_flat))):
        res = time_device(chain(fns), x0, iters=4, repeats=4)
        us = res["us_per_iter"] / B
        print(json.dumps({"arm": tag, "us_per_poly_3prime": round(us, 1)}),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
