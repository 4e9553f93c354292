"""ONE-session nested-vs-plain column A/B for the Goldilocks plan.

Round 5 found every cross-session GL comparison unreliable (sessions on
this shared chip differ by up to ~2.6x; two same-day GL sessions anchored
fwd at ~1360-1430 us/NTT where round 3's session read 1010). This script
settles the nested-column question for GL the only honest way: both
variants built in ONE process, timed interleaved in ONE session.

The plain variant is whatever nested_col_split(wide=True) currently
yields; the nested variant monkeypatches nested_col_split to ignore
`wide` (the 32-bit formula) and clears the four-step table memo so pos/
wmat rebuild under the nested order. Each arm's plan is self-consistent;
cross-arm correctness compares NATURAL-order outputs (each arm's own
spectral_to_natural) and runs its own roundtrip.

Run: python scripts/bench_gl_nestab.py [B] [log_n]
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
    from ntt_aie_tpu import twiddles as tw
    from ntt_aie_tpu.goldilocks_plan import build_goldilocks_plan
    from ntt_aie_tpu.ops import modops as M
    from ntt_aie_tpu.utils.timing import time_device

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    log_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    cfg = NTTConfig(field=field, log_n=log_n)
    n = cfg.n
    rng = np.random.default_rng(0)
    vals = (rng.integers(0, 1 << 63, (B, n), dtype=np.uint64)
            % np.uint64(field.p))
    a = tuple(jnp.asarray(v) for v in M.gl_from_u64(vals))

    def build(nested: bool):
        orig = tw.nested_col_split
        if nested:
            tw.nested_col_split = (
                lambda nn, *, wide=False, _o=orig: _o(nn, wide=False))
        tw._FOURSTEP_MEMO.clear()
        try:
            plan = build_goldilocks_plan(cfg, engine="pallas")
            # the batched builder compiles its column networks lazily —
            # it must run under the SAME patched schedule as the tables
            bat = plan.make_batched(B)
        finally:
            tw.nested_col_split = orig
            tw._FOURSTEP_MEMO.clear()
        return plan, bat

    plain, plain_b = build(False)
    nested, nested_b = build(True)

    # correctness: natural-order outputs equal across arms; roundtrips ok
    outs = {}
    for name, (plan, bat) in (("plain", (plain, plain_b)),
                              ("nested", (nested, nested_b))):
        h, l = bat["fwd"](a)
        got = np.asarray(M.gl_to_u64(np.asarray(h)[0], np.asarray(l)[0]))
        outs[name] = got[plan.spectral_to_natural]
        bh, bl = bat["inv"]((h, l))
        assert np.array_equal(
            np.asarray(M.gl_to_u64(np.asarray(bh)[:2], np.asarray(bl)[:2])),
            vals[:2]), f"{name} roundtrip failed"
    assert np.array_equal(outs["plain"], outs["nested"]), \
        "arms disagree in natural order"
    print(json.dumps({"probe": "gates", "ok": True, "B": B,
                      "log_n": log_n}))

    si = {}
    for name, bat in (("plain", plain_b), ("nested", nested_b)):
        si[name] = tuple(jnp.asarray(np.asarray(z)) for z in bat["fwd"](a))

    # interleaved arms: fwd plain/nested/plain/nested, then inv likewise
    seq = [("plain/fwd", plain_b["fwd"], a),
           ("nested/fwd", nested_b["fwd"], a),
           ("plain/fwd2", plain_b["fwd"], a),
           ("nested/fwd2", nested_b["fwd"], a),
           ("plain/inv", plain_b["inv"], si["plain"]),
           ("nested/inv", nested_b["inv"], si["nested"]),
           ("plain/inv2", plain_b["inv"], si["plain"]),
           ("nested/inv2", nested_b["inv"], si["nested"])]
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
