"""GL column-pass net/fuse scan on the real TPU (64-bit limb kernels).

Times one GL pass (n1=1024) over a batched lane axis for DIF fuse 1/2/3
and DIT {tree, parts} x fuse — checks whether the 32-bit parts-net win
(DESIGN.md §3 DIT ladder) carries to the limb kernels where gl_mul's
~70 lane-ops dominate. Run: python scripts/scan_gl_nets.py [B]
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

    from ntt_aie_tpu import GOLDILOCKS as field
    from ntt_aie_tpu.ops import pallas_gl as PG
    from ntt_aie_tpu.goldilocks_plan import _split_limbs
    from ntt_aie_tpu.utils.timing import time_device

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    only = sys.argv[2] if len(sys.argv) > 2 else ""
    n1, n2 = 1024, 1024
    rng = np.random.default_rng(0)
    v = rng.integers(0, field.p, (n1, n2 * B), dtype=np.uint64)
    h, l = (jnp.asarray(x) for x in _split_limbs(v))

    variants = [("dif", "tree", f) for f in (1, 2, 3)]
    variants += [("dit", net, f) for net in ("tree", "parts")
                 for f in (1, 2, 3, 5, 6, 7)]
    for direction, net, fuse in variants:
        name = f"{direction}_{net}_f{fuse}"
        if only and only not in name:
            continue
        cp = PG.make_gl_colpass(field, n1, n2 * B, direction=direction,
                                inverse_tw=(direction == "dit"),
                                fuse=fuse, dit_net=net)
        fn = lambda hh, _cp=cp: _cp(hh[0], hh[1])
        res = time_device(fn, (h, l), iters=10, repeats=5)
        print(json.dumps({"variant": name, "B": B,
                          "us_per_pass": round(res["us_per_iter"], 1)}))
    return 0


if __name__ == "__main__":
    main()
