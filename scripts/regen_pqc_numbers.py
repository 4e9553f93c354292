"""Regenerate the README/DESIGN §6 PQC throughput numbers.

Times the jitted ``make_pipeline()`` bundles (the documented hot path)
with the readback-fenced chain methodology from utils/timing. Run on the
real TPU: ``python scripts/regen_pqc_numbers.py``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ntt_aie_tpu.utils.platform import honor_platform_env

honor_platform_env()  # make JAX_PLATFORMS effective despite sitecustomize

import jax
import jax.numpy as jnp

from ntt_aie_tpu import dilithium as DL
from ntt_aie_tpu import kyber as KY
from ntt_aie_tpu.utils.timing import time_device


def main() -> None:
    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    B = 8192

    kp = KY.make_pipeline()
    a = jnp.asarray(rng.integers(0, KY.Q, (B, 256)), dtype=jnp.uint32)
    b = jnp.asarray(rng.integers(0, KY.Q, (B, 256)), dtype=jnp.uint32)
    r = time_device(kp["ntt"], a, iters=50, repeats=3)
    print(f"ML-KEM NTT        B={B}: {B / r['us_per_iter']:8.2f} M/s")
    r = time_device(lambda x: kp["polymul"](x, b), a, iters=50, repeats=3)
    print(f"ML-KEM ring mult  B={B}: {B / r['us_per_iter']:8.2f} M/s")

    dp = DL.make_pipeline()
    c = jnp.asarray(rng.integers(0, DL.Q, (B, 256)), dtype=jnp.uint32)
    d = jnp.asarray(rng.integers(0, DL.Q, (B, 256)), dtype=jnp.uint32)
    r = time_device(dp["ntt"], c, iters=50, repeats=3)
    print(f"ML-DSA NTT        B={B}: {B / r['us_per_iter']:8.2f} M/s")
    r = time_device(lambda x: dp["polymul"](x, d), c, iters=50, repeats=3)
    print(f"ML-DSA ring mult  B={B}: {B / r['us_per_iter']:8.2f} M/s")

    # Serving steps: fixed NTT-domain A reused across a batch of vectors.
    # time_device chains y = fn(y), so the timed fn must be shape-
    # preserving: pad the (B, k, 256) output back to (B, l, 256) when
    # k != l (DESIGN.md §6 gotcha).
    Bs = 1024
    Ak = kp["ntt"](jnp.asarray(
        rng.integers(0, KY.Q, (3, 3, 256)), dtype=jnp.uint32))
    kstep = kp["make_serving_step"](Ak)
    vk = jnp.asarray(rng.integers(0, KY.Q, (Bs, 3, 256)), dtype=jnp.uint32)
    r = time_device(kstep, vk, iters=20, repeats=3)
    print(f"ML-KEM-768 serving step B={Bs}: "
          f"{Bs / r['us_per_iter'] * 1e3:8.1f} k/s")

    Ad = dp["ntt"](jnp.asarray(
        rng.integers(0, DL.Q, (6, 5, 256)), dtype=jnp.uint32))
    dstep = dp["make_serving_step"](Ad)
    vd = jnp.asarray(rng.integers(0, DL.Q, (Bs, 5, 256)), dtype=jnp.uint32)
    dstep_chain = jax.jit(lambda x: dstep(x)[:, :5, :])
    r = time_device(dstep_chain, vd, iters=20, repeats=3)
    print(f"ML-DSA-65 serving step  B={Bs}: "
          f"{Bs / r['us_per_iter'] * 1e3:8.1f} k/s")


if __name__ == "__main__":
    main()
