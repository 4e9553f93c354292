"""End-to-end RNS polymul: host object-math CRT vs the device combine.

Three paths at n=2^20 (all include the residue-encode host step and the
k=3 device polymuls; they differ only in the CRT recombination):
  host_crt     — k residue readbacks + O(n*k) object math (round-1 path)
  device_limbs — ops/crt.py Garner combine on device, ONE (n, L) uint32
                 readback, consumer keeps multi-word form
  device_int   — device combine + limbs_to_int host decode (object API)

Wall-clock timing (the quantity of interest IS the host-inclusive path).
Run: python scripts/bench_rns_crt.py [log_n] [repeats]
"""
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ntt_aie_tpu.utils.platform import honor_platform_env
honor_platform_env()  # make JAX_PLATFORMS effective despite sitecustomize

import numpy as np


def main() -> int:
    from ntt_aie_tpu.ops.crt import limbs_to_int
    from ntt_aie_tpu.rns import RNSPolymul

    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n = 1 << log_n
    rns = RNSPolymul(log_n)
    assert rns._combine is not None
    bound = min(rns.max_input_bound(), 1 << 33)
    rng = np.random.default_rng(0)
    a = np.array([int(x) for x in rng.integers(0, bound, n)], dtype=object)
    b = np.array([int(x) for x in rng.integers(0, bound, n)], dtype=object)

    def host_crt():
        combine = rns._combine
        rns._combine = None
        try:
            return rns.polymul(a, b)
        finally:
            rns._combine = combine

    def device_int():
        return rns.polymul(a, b)

    def device_limbs():
        return np.asarray(rns.polymul_limbs(a, b))

    # exactness gate before timing (bench.py convention)
    want = host_crt()
    got = device_int()
    assert np.array_equal(got, want), "device CRT != host CRT"
    assert np.array_equal(limbs_to_int(device_limbs()), want)

    out = {"log_n": log_n, "k": len(rns.fields), "nwords": rns.nwords}
    for name, fn in (("host_crt", host_crt), ("device_limbs", device_limbs),
                     ("device_int", device_int)):
        fn()  # warm (compile, caches)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        out[f"{name}_ms"] = round(best * 1e3, 1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
