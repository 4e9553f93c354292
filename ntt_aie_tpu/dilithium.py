"""ML-DSA (FIPS 204 / Dilithium) native NTT over Z_8380417[X]/(X^256 + 1).

Unlike ML-KEM's incomplete transform (kyber.py), ML-DSA's q = 8380417 has
512th roots of unity (zeta = 1753), so its NTT is COMPLETE: 8 layers down
to len = 1, plain coefficient-wise products in the NTT domain, and the
standard's exact BitRev8 zeta ordering (FIPS 204 Algorithms 41-45). The
NTT-domain representation here is bit-compatible with the standard —
signatures/keys that store NTT-domain polynomials interoperate.

Arithmetic: q > 2^14 rules out the Barrett-2k path, so butterflies use
Montgomery REDC (R = 2^32) with zeta tables premultiplied into Montgomery
form — mont_mul(standard_value, zeta*R) = standard_value * zeta
(ops/modops.py, same machinery as the generic Montgomery plans).

Layout matches kyber.py: coefficients on sublanes, batch on lanes.
All functions accept (..., 256) uint32 arrays, batched or single.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ntt_aie_tpu import fields as F
from ntt_aie_tpu.ops import modops as M
from ntt_aie_tpu.twiddles import bit_reverse_indices

Q = 8380417
ZETA = 1753
N = 256
_FIELD = F.DILITHIUM
_NEG_PINV = _FIELD.mont_neg_pinv
_R = _FIELD.mont_r_mod_p
_R2 = _FIELD.mont_r2_mod_p


def _bitrev8(x: int) -> int:
    return int(bit_reverse_indices(256)[x])


def _to_mont(x: int) -> np.uint32:
    return np.uint32(x * _R % Q)


def _layer_zetas(inverse: bool = False) -> list[np.ndarray]:
    """Per-layer per-block zeta vectors in Montgomery form. Layer L
    (L = 0..7) has 2^L blocks of half-length len = 128 >> L; FIPS 204's
    sequential index k gives block i the value zeta^BitRev8(2^L + i)."""
    layers = []
    for L in range(8):
        blocks = 1 << L
        vals = [F.modpow(ZETA, _bitrev8(blocks + i), Q) for i in range(blocks)]
        if inverse:
            vals = [F.modpow(v, Q - 2, Q) for v in vals]
        layers.append(np.array([_to_mont(v) for v in vals], dtype=np.uint32))
    return layers


_ZETAS = _layer_zetas()
_IZETAS = _layer_zetas(inverse=True)
_N_INV_MONT = _to_mont(F.modpow(256, Q - 2, Q))


def _mulz(a, z):
    """a * zeta for Montgomery-form zeta tables."""
    return M.mont_mul(a, z, Q, _NEG_PINV)


def _as_cols(f):
    f = jnp.asarray(f, dtype=jnp.uint32)
    shape = f.shape
    return f.reshape(-1, N).T, lambda y: y.T.reshape(shape)


def dilithium_ntt(f):
    """FIPS 204 Algorithm 41 over the last axis (length 256)."""
    x, restore = _as_cols(f)
    c = x.shape[1]
    for L in range(8):
        len_ = 128 >> L
        blocks = 1 << L
        xr = x.reshape(blocks, 2, len_, c)
        u, v = xr[:, 0], xr[:, 1]
        z = jnp.asarray(_ZETAS[L]).reshape(blocks, 1, 1)
        t = _mulz(v, z)
        x = jnp.stack(
            [M.add_mod(u, t, Q), M.sub_mod(u, t, Q)], axis=1
        ).reshape(N, c)
    return restore(x)


def dilithium_intt(fhat):
    """FIPS 204 Algorithm 42 (inverse layers in reverse, 1/256 scale)."""
    x, restore = _as_cols(fhat)
    c = x.shape[1]
    for L in reversed(range(8)):
        len_ = 128 >> L
        blocks = 1 << L
        xr = x.reshape(blocks, 2, len_, c)
        u, v = xr[:, 0], xr[:, 1]
        z = jnp.asarray(_IZETAS[L]).reshape(blocks, 1, 1)  # zeta^-1, Mont
        new_u = M.add_mod(u, v, Q)
        new_v = _mulz(M.sub_mod(u, v, Q), z)
        x = jnp.stack([new_u, new_v], axis=1).reshape(N, c)
    x = _mulz(x, jnp.full((1, 1), _N_INV_MONT, dtype=jnp.uint32))
    return restore(x)


def dilithium_pointwise(ahat, bhat):
    """Coefficient-wise product in the NTT domain (FIPS 204 Algorithm 45;
    the complete NTT needs no basemul)."""
    a = jnp.asarray(ahat, dtype=jnp.uint32)
    b = jnp.asarray(bhat, dtype=jnp.uint32)
    ab = M.mont_mul(a, b, Q, _NEG_PINV)          # a*b*R^-1
    return M.mont_mul(ab, np.uint32(_R2), Q, _NEG_PINV)  # fixup -> a*b


def dilithium_polymul(a, b):
    """a * b in Z_8380417[X]/(X^256 + 1) via the ML-DSA pipeline."""
    return dilithium_intt(dilithium_pointwise(dilithium_ntt(a),
                                              dilithium_ntt(b)))


def dilithium_matvec(ahat, yhat):
    """Module-lattice matrix-vector product in the NTT domain: the ML-DSA
    serving primitive (w = A*y in Sign / verify's A*z, FIPS 204 Algorithms
    7-8). ``ahat``: (..., k, l, 256), ``yhat``: (..., l, 256), NTT-domain;
    returns (..., k, 256) = sum_j ahat[..., i, j, :] * yhat[..., j, :]
    coefficient-wise. k, l <= 8, so the sum is an unrolled add_mod chain."""
    a = jnp.asarray(ahat, dtype=jnp.uint32)
    y = jnp.asarray(yhat, dtype=jnp.uint32)
    l = a.shape[-2]
    acc = dilithium_pointwise(a[..., :, 0, :], y[..., None, 0, :])
    for j in range(1, l):
        acc = M.add_mod(
            acc, dilithium_pointwise(a[..., :, j, :], y[..., None, j, :]), Q)
    return acc
