"""K-scan for the DIT (inverse) fused stage groups on the real TPU.

Times one inverse column pass (n1=1024 points, DIT, harvey4) over a
batched lane axis, for fuse levels 1/2/3/4 — mirrors the forward K scan
in DESIGN.md §3. Run: python scripts/scan_dit_fuse.py [B]
"""
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ntt_aie_tpu.utils.platform import honor_platform_env
honor_platform_env()  # make JAX_PLATFORMS effective despite sitecustomize

import numpy as np


def main() -> int:
    import jax.numpy as jnp

    from ntt_aie_tpu import P_469762049 as field
    from ntt_aie_tpu.ops import pallas_ntt as PN
    from ntt_aie_tpu.utils.timing import time_device

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n1 = n2 = 1024
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(0, field.p, (n1, n2 * B)).astype(np.uint32))

    net = sys.argv[2] if len(sys.argv) > 2 else "parts"
    base_out = None
    for fuse in (1, 2, 3, 4, 5, 6):
        # canonicalize before comparing: raw lazy-domain bits legally
        # differ across fuse levels/nets (only canonical outputs are
        # contractual — see run_stages docstring)
        cp = PN.make_colpass(field, n1, n2 * B, reduction="harvey4",
                             direction="dit", inverse_tw=True, fuse=fuse,
                             batch=1, dit_net=net, canonicalize=True)
        out = np.asarray(cp(x))
        if base_out is None:
            base_out = out
        else:
            assert np.array_equal(out, base_out), f"fuse={fuse} mismatch"
        res = time_device(cp, x, iters=10, repeats=5)
        print(f"net={net} fuse={fuse}: {res['us_per_iter']:.1f} us/pass "
              f"({res['us_per_iter']/B:.2f} us per 2^20-NTT share)")
    return 0


if __name__ == "__main__":
    main()
