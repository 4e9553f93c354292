"""Round-5 headline candidates A/B (VERDICT r4 #4), one session:

(a) wmat_fold — the four-step twiddle multiply folded into pass 1's exit
    epilogue ('post_t', riding the transposed tile on the output store)
    instead of pass 2's entry. DESIGN.md §2 named this candidate: at B=1
    the committed trace shows pass 2 HBM-bound at 79% on wmat table
    traffic while pass 1 has HBM headroom; folding rebalances the table
    stream. Bit-identical outputs by construction (regression-tested).
(b) wide lane slabs — block_lanes 1024 (grid=1 at the 1024x1024 headline
    shape) vs the default 512. Round 2 measured a wash pre-nested; the
    nested networks changed the per-grid-step economics.

All arms time the matrix-form batched forward (the headline callable),
same session, interleaved base re-measure to bound drift; bit-exactness
checked between arms on a row sample.

Run: python scripts/bench_fold.py [B] [log_n]
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
    from ntt_aie_tpu import twiddles as tw
    from ntt_aie_tpu.ops import pallas_ntt as PN
    from ntt_aie_tpu.plan import build_plan
    from ntt_aie_tpu.utils.timing import time_device

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    log_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    cfg = NTTConfig(field=field, log_n=log_n,
                    rows_log2=log_n // 2)
    n1, n2 = cfg.split
    n = cfg.n
    rng = np.random.default_rng(0)
    flat = rng.integers(0, field.p, (B, n)).astype(np.uint32)
    x2d = jnp.asarray(flat.reshape(B, n1, n2))

    # fold is the plan default since round 5; base pins the entry placement
    base = build_plan(cfg, engine="pallas", wmat_fold=False)
    fold = build_plan(cfg, engine="pallas", wmat_fold=True)
    assert fold.wmat_fold
    bat_base = base.make_batched(B)
    bat_fold = fold.make_batched(B)

    # arm (b): both passes at block_lanes=1024 (grid=1), matrix-form chain
    kind = base.reduction
    tabs = tw.fourstep_tables(field, n1, n2)
    wide_lanes = min(1024, n2)
    kw_w = dict(reduction=kind, batch=B, block_lanes=wide_lanes)
    cp1w = PN.make_colpass(field, n1, n2, direction="dif",
                           transpose_out=True, **kw_w)
    cp2w = PN.make_colpass(field, n2, n1, direction="dif",
                           wmat=np.ascontiguousarray(tabs["wmat"].T),
                           twiddle_pos="pre", canonicalize=True, **kw_w)

    def fwd_wide(x):
        return cp2w(cp1w(x))

    # bit-exactness between arms (4-row sample; full-gate lives in bench.py)
    y_base = np.asarray(bat_base["fwd_mat"](x2d)[:4])
    for name, fn in (("fold", bat_fold["fwd_mat"]), ("wide", fwd_wide)):
        y = np.asarray(fn(x2d)[:4])
        assert np.array_equal(y, y_base), f"{name} != base on device"
    print(json.dumps({"probe": "bitexact", "ok": True, "B": B,
                      "log_n": log_n, "wide_lanes": wide_lanes}))

    # timed arms, interleaved (base first and last to bound session drift)
    arms = [("base", bat_base["fwd_mat"]),
            ("fold", bat_fold["fwd_mat"]),
            ("wide", fwd_wide),
            ("base2", bat_base["fwd_mat"])]
    def timed(tag, fn, x0, iters=10, key="us_per_ntt"):
        # transient tunnel/remote-compile hiccups must not lose the
        # session's earlier arms; report and continue
        try:
            res = time_device(fn, x0, iters=iters, repeats=5)
            us = res["us_per_iter"] / B
            print(json.dumps({"arm": tag, key: round(us, 2),
                              "per_sec": round(1e6 / us, 1)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"arm": tag,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)

    for name, fn in arms:
        timed(name, fn, x2d)

    # inverse + polymul under fold (matrix-form), vs base
    si = jnp.asarray(np.asarray(bat_base["fwd_mat"](x2d)))
    for name, bat in (("base", bat_base), ("fold", bat_fold)):
        timed(f"{name}/inv_mat", bat["inv_mat"], si)
        timed(f"{name}/polymul_mat", lambda v, _b=bat: _b["polymul_mat"](v, v),
              x2d, iters=4, key="us_per_poly")
    return 0


if __name__ == "__main__":
    sys.exit(main())
