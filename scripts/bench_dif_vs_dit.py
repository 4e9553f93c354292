"""Head-to-head DIF vs DIT column-pass timing on the real TPU.

Localizes the inverse-pass premium (VERDICT r2 weak #1: inv ~1.5x fwd at
n=2^20 B=64): builds the SAME-shaped pass in both directions, with and
without the fused transpose epilogue and the wmat multiply, so the delta
attributable purely to the DIT stage network is isolated.

Run: python scripts/bench_dif_vs_dit.py [B]
Prints one JSON line per variant.
"""
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ntt_aie_tpu.utils.platform import honor_platform_env
honor_platform_env()

import numpy as np


def main() -> int:
    import jax.numpy as jnp

    from ntt_aie_tpu import P_469762049 as field
    from ntt_aie_tpu import twiddles as tw
    from ntt_aie_tpu.ops import pallas_ntt as PN
    from ntt_aie_tpu.utils.timing import time_device

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n1 = n2 = 1024
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(0, field.p, (n1, n2 * B)).astype(np.uint32))

    tabs = tw.fourstep_tables(field, n1, n2)
    wmat_wide = np.ascontiguousarray(
        np.tile(np.ascontiguousarray(tabs["wmat"].T), (1, B)))

    variants = {
        "dif_plain": dict(direction="dif"),
        "dit_tree_plain": dict(direction="dit", inverse_tw=True,
                               dit_net="tree"),
        "dit_iter_plain": dict(direction="dit", inverse_tw=True,
                               dit_net="iter"),
        "dif_transpose": dict(direction="dif", transpose_out=True),
        "dit_tree_transpose": dict(direction="dit", inverse_tw=True,
                                   transpose_out=True, dit_net="tree"),
        "dit_iter_transpose": dict(direction="dit", inverse_tw=True,
                                   transpose_out=True, dit_net="iter"),
        "dif_wmat_canon": dict(direction="dif", wmat=wmat_wide,
                               twiddle_pos="pre", canonicalize=True),
        "dit_tree_wmat_canon": dict(direction="dit", inverse_tw=True,
                                    wmat=wmat_wide, twiddle_pos="pre",
                                    canonicalize=True, dit_net="tree"),
        "dit_iter_wmat_canon": dict(direction="dit", inverse_tw=True,
                                    wmat=wmat_wide, twiddle_pos="pre",
                                    canonicalize=True, dit_net="iter"),
        "dit_parts_plain": dict(direction="dit", inverse_tw=True,
                                dit_net="parts"),
        "dit_parts_transpose": dict(direction="dit", inverse_tw=True,
                                    transpose_out=True, dit_net="parts"),
        "dit_parts_wmat_canon": dict(direction="dit", inverse_tw=True,
                                     wmat=wmat_wide, twiddle_pos="pre",
                                     canonicalize=True, dit_net="parts"),
        "dit_tree_f2_plain": dict(direction="dit", inverse_tw=True,
                                  dit_net="tree", fuse=2),
        "dit_parts_f4_plain": dict(direction="dit", inverse_tw=True,
                                   dit_net="parts", fuse=4),
        "dit_parts_f5_plain": dict(direction="dit", inverse_tw=True,
                                   dit_net="parts", fuse=5),
        "dit_parts_f6_plain": dict(direction="dit", inverse_tw=True,
                                   dit_net="parts", fuse=6),
        "dit_parts_f7_plain": dict(direction="dit", inverse_tw=True,
                                   dit_net="parts", fuse=7),
        "dit_parts_f5_transpose": dict(direction="dit", inverse_tw=True,
                                       transpose_out=True, dit_net="parts",
                                       fuse=5),
        "dit_parts_f5_wmat_canon": dict(direction="dit", inverse_tw=True,
                                        wmat=wmat_wide, twiddle_pos="pre",
                                        canonicalize=True, dit_net="parts",
                                        fuse=5),
        "dif_f5_plain": dict(direction="dif", fuse=5),
        "dif_f4_plain": dict(direction="dif", fuse=4),
    }
    only = sys.argv[2] if len(sys.argv) > 2 else ""
    for name, kw in variants.items():
        if only and only not in name:
            continue
        cp = PN.make_colpass(field, n1, n2 * B, reduction="harvey4",
                             batch=1, **kw)
        if kw.get("transpose_out"):
            # output is (n2*B, n1): reinterpret for the dependent chain
            # (values stay in the legal [0, 4p) travel domain)
            fn = lambda a, _cp=cp: _cp(a).reshape(n1, n2 * B)  # noqa: E731
        else:
            fn = cp
        res = time_device(fn, x, iters=10, repeats=5)
        print(json.dumps({"variant": name, "B": B,
                          "us_per_pass": round(res["us_per_iter"], 1),
                          "us_per_ntt_share": round(res["us_per_iter"] / B, 2)}))
    return 0


if __name__ == "__main__":
    main()
