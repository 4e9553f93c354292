"""Round-4 fuse/net re-scan under the nested column networks.

The nested phases are at most log2(R|S) ~ 5 stages deep and run at full
sublane occupancy, which invalidates the pre-nested measured defaults
(32-bit DIF f3 / DIT parts f5; GL DIF f3 / DIT parts f7). One session,
all candidates, canonical outputs cross-checked per width+direction.

Run: python scripts/scan_nested_fuse.py [B32] [B_gl]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ntt_aie_tpu.utils.platform import honor_platform_env
honor_platform_env()

import numpy as np


def main() -> int:
    import jax.numpy as jnp

    from ntt_aie_tpu import P_469762049 as field, GOLDILOCKS as gl
    from ntt_aie_tpu.ops import pallas_ntt as PN
    from ntt_aie_tpu.ops import pallas_gl as PG
    from ntt_aie_tpu.ops import modops as M
    from ntt_aie_tpu.utils.timing import time_device

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    Bg = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n1 = n2 = 1024
    rng = np.random.default_rng(0)

    # ---- 32-bit: DIF and DIT fuse/net scan ----
    x = jnp.asarray(rng.integers(0, field.p, (n1, n2 * B)).astype(np.uint32))
    for direction, nets in (("dif", ["parts"]), ("dit", ["parts", "tree"])):
        for net in nets:
            base = None
            for fuse in (1, 2, 3, 4, 5):
                cp = PN.make_colpass(field, n1, n2 * B, reduction="harvey4",
                                     direction=direction,
                                     inverse_tw=(direction == "dit"),
                                     fuse=fuse, dit_net=net,
                                     canonicalize=True)
                out = np.asarray(cp(x))
                if base is None:
                    base = out
                else:
                    assert np.array_equal(out, base), (direction, net, fuse)
                res = time_device(cp, x, iters=8, repeats=4)
                print(f"u32 {direction} net={net} fuse={fuse}: "
                      f"{res['us_per_iter']:.1f} us/pass "
                      f"({res['us_per_iter']/B:.2f} us/NTT-share)")

    # ---- Goldilocks: DIF and DIT fuse scan on the limb kernels ----
    vals = (rng.integers(0, 1 << 63, (n1, n2 * Bg), dtype=np.uint64)
            % np.uint64(gl.p))
    h, l = M.gl_from_u64(vals)
    for direction, nets in (("dif", ["parts"]), ("dit", ["parts", "tree"])):
        for net in nets:
            base = None
            for fuse in (1, 2, 3, 5):
                cp = PG.make_gl_colpass(gl, n1, n2 * Bg,
                                        direction=direction,
                                        inverse_tw=(direction == "dit"),
                                        fuse=fuse, dit_net=net)
                oh, ol = cp(h, l)
                out = np.asarray(oh), np.asarray(ol)
                if base is None:
                    base = out
                else:
                    assert (np.array_equal(out[0], base[0])
                            and np.array_equal(out[1], base[1])), \
                        (direction, net, fuse)
                res = time_device(lambda hl: cp(hl[0], hl[1]), (h, l),
                                  iters=4, repeats=4)
                print(f"gl  {direction} net={net} fuse={fuse}: "
                      f"{res['us_per_iter']:.1f} us/pass "
                      f"({res['us_per_iter']/Bg:.2f} us/NTT-share)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
