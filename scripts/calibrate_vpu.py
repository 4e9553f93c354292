"""Round-4 VPU calibration: ideal-conditions butterfly rate vs the
headline kernel's achieved rate (VERDICT round-3 item 1).

Run on the real TPU: python scripts/calibrate_vpu.py [quick]
Prints one JSON line per probe + the efficiency verdict.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    import jax
    print(f"backend={jax.default_backend()} {jax.devices()[0].device_kind}",
          file=sys.stderr)
    from ntt_aie_tpu.profiling import roofline

    for r in ([64] if quick else [32, 64, 128]):
        out = roofline.measure_vpu_peak(r=r, iters=6, repeats=4, cache=False)
        print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                          for k, v in out.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
