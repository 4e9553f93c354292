"""Batched post-quantum-crypto serving: ML-KEM and ML-DSA module-lattice
arithmetic on device.

The serving-side hot loop of both FIPS standards is NTT -> NTT-domain
matrix-vector product -> inverse NTT (K-PKE encrypt computes u = A^T*r,
ML-DSA Sign computes w = A*y). This demo runs a batch of those products
through the device pipeline and cross-checks one lane against the
schoolbook oracle.

    python examples/pqc_serving_demo.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from ntt_aie_tpu import dilithium as DL
from ntt_aie_tpu import kyber as KY
from ntt_aie_tpu import reference as ref

BATCH = 64


def _check_one(A, s, got, q, label):
    want = np.zeros(256, dtype=np.int64)
    for j in range(A.shape[1]):
        want = (want + ref.schoolbook_negacyclic(A[0, j], s[j], q)) % q
    assert np.array_equal(got.astype(np.int64), want), label
    print(f"{label}: device == schoolbook oracle ✓")


def main() -> int:
    rng = np.random.default_rng(0)

    # --- ML-KEM-512 shape: t = A*s, A in R_q^{2x2}, batch of keygens ---
    k = 2
    A = rng.integers(0, KY.Q, (BATCH, k, k, 256), dtype=np.uint32)
    s = rng.integers(0, KY.Q, (BATCH, k, 256), dtype=np.uint32)
    th = KY.kyber_matvec(KY.kyber_ntt(A), KY.kyber_ntt(s))
    t = np.asarray(KY.kyber_intt(th))
    _check_one(A[0], s[0], t[0, 0], KY.Q, f"ML-KEM t=A*s (k={k}, B={BATCH})")

    # --- ML-DSA-65 shape: w = A*y, A in R_q^{6x5}, batch of signatures ---
    kk, ll = 6, 5
    A2 = rng.integers(0, DL.Q, (BATCH, kk, ll, 256), dtype=np.uint32)
    y = rng.integers(0, DL.Q, (BATCH, ll, 256), dtype=np.uint32)
    wh = DL.dilithium_matvec(DL.dilithium_ntt(A2), DL.dilithium_ntt(y))
    w = np.asarray(DL.dilithium_intt(wh))
    _check_one(A2[0], y[0], w[0, 0], DL.Q,
               f"ML-DSA w=A*y (k={kk}, l={ll}, B={BATCH})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
