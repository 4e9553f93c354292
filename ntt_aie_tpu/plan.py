"""Plan builder: compiles an NTTConfig into jitted device callables.

The forward transform is the four-step decomposition (SURVEY.md §5.7): with
N = N1 x N2 and input viewed row-major as an (N1, N2) matrix,

    fwd = flatten . colDIF_{N2} . transpose . (* W) . colDIF_{N1} . reshape

where colDIF is the stage loop of ops/stages.py (butterflies along sublanes)
and W[r, j2] = omega^(br1(r) * j2) has the DIF output bit-reversal baked in
host-side. The flat output is in a fixed "spectral" order:

    flat[c*N1 + r] = X[br2(c)*N1 + br1(r)]

Pointwise products are order-agnostic, so polymul never permutes; a natural-
order gather is planned only when config.ordering == 'natural'.

The inverse runs the mirror (colDIT passes), with the full 1/N scale — and,
on the Montgomery path, the stray R^-1 from pointwise products — folded into
the inverse twiddle matrix, so no extra passes over the data.

This module is the XLA-compiled engine; the Pallas kernels in
ops/pallas_ntt.py plug into the same plan as a fused alternative for the
single-chip hot path. Multi-chip plans shard the same passes with shard_map
(parallel/fourstep.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ntt_aie_tpu.config import NTTConfig
from ntt_aie_tpu import twiddles as tw
from ntt_aie_tpu import reference as ref
from ntt_aie_tpu.ops import stages as S


@dataclasses.dataclass
class Plan:
    config: NTTConfig
    fwd: Callable
    inv: Callable
    polymul: Callable
    negacyclic_polymul: Optional[Callable]
    spectral_to_natural: Optional[np.ndarray]  # gather indices, or None
    tables_bytes: int


def _u32c(t: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.ascontiguousarray(t.astype(np.uint32)))


def build_plan(config: NTTConfig, *, use_pallas: str = "auto") -> Plan:
    field = config.field
    n = config.n
    p = field.p
    red = config.resolved_reduction

    if config.table_convention == "reference":
        return _build_reference_plan(config)
    if red == "goldilocks":
        return _build_goldilocks_plan(config)

    mul_const, mul_data, table_form = S.make_mul(red, field)
    n1, n2 = config.split

    # ---- host-side table preparation ----
    br1 = tw.bit_reverse_indices(n1)
    tw1 = _u32c(table_form(tw.pack_stage_twiddles(tw.dif_stage_twiddles(field, n1), n1)))
    itw1 = _u32c(table_form(tw.pack_stage_twiddles(tw.dit_stage_twiddles(field, n1, inverse=True), n1)))
    if n2 > 1:
        br2 = tw.bit_reverse_indices(n2)
        tw2 = _u32c(table_form(tw.pack_stage_twiddles(tw.dif_stage_twiddles(field, n2), n2)))
        itw2 = _u32c(table_form(tw.pack_stage_twiddles(tw.dit_stage_twiddles(field, n2, inverse=True), n2)))
        wmat = tw.fourstep_twiddle_matrix(field, n1, n2)[br1, :]
        wmat_dev = _u32c(table_form(wmat))
        n_inv = field.inv(n)
        iwmat = tw.fourstep_twiddle_matrix(field, n1, n2, inverse=True)[br1, :]
        iwmat_scaled = iwmat.astype(object) * n_inv % p
        iwmat_dev = _u32c(table_form(iwmat_scaled))
        if red == "montgomery":
            # polymul inverse also cancels the R^-1 left by the pointwise REDC
            iwmat_poly = iwmat_scaled * field.mont_r_mod_p % p
            iwmat_poly_dev = _u32c(table_form(iwmat_poly))
        else:
            iwmat_poly_dev = iwmat_dev
    else:
        n_inv = field.inv(n)
        # flat path scale vector (folded into last DIT stage via a 1-element table)
        scale = _u32c(table_form(np.array([n_inv], dtype=np.int64)))
        scale_poly = (
            _u32c(table_form(np.array([n_inv * field.mont_r_mod_p % p], dtype=np.int64)))
            if red == "montgomery"
            else scale
        )

    # ---- device functions ----
    if n2 > 1:

        def fwd_fn(a):
            x = a.astype(jnp.uint32).reshape(n1, n2)
            x = S.dif_stages(x, tw1, p, mul_const)
            x = mul_const(x, wmat_dev)
            x = x.T
            x = S.dif_stages(x, tw2, p, mul_const)
            return x.reshape(n)

        def _inv_core(a, iw):
            x = a.astype(jnp.uint32).reshape(n2, n1)
            x = S.dit_stages(x, itw2, p, mul_const)
            x = x.T
            x = mul_const(x, iw)
            x = S.dit_stages(x, itw1, p, mul_const)
            return x.reshape(n)

        inv_fn = partial(_inv_core, iw=iwmat_dev)

        def polymul_fn(a, b):
            fa = fwd_fn(a)
            fb = fwd_fn(b)
            if red == "montgomery":
                from ntt_aie_tpu.ops import modops as M

                fc = M.mont_mul(fa, fb, p, field.mont_neg_pinv)  # a*b*R^-1
            else:
                fc = mul_data(fa, fb)
            return _inv_core(fc, iwmat_poly_dev)

        pos = (br2[np.arange(n) // n1] * n1 + br1[np.arange(n) % n1]).astype(np.int32)
        # X[k] = flat[pos[k]] with k = k2*n1 + k1
        spectral_to_natural = pos

    else:
        # flat path: plain DIF/DIT on (n, 1)
        def fwd_fn(a):
            x = a.astype(jnp.uint32).reshape(n1, 1)
            x = S.dif_stages(x, tw1, p, mul_const)
            return x.reshape(n)

        def _inv_core_flat(a, sc):
            x = a.astype(jnp.uint32).reshape(n1, 1)
            x = S.dit_stages(x, itw1, p, mul_const)
            return mul_const(x, sc.reshape(1, 1)).reshape(n)

        inv_fn = partial(_inv_core_flat, sc=scale)

        def polymul_fn(a, b):
            fa = fwd_fn(a)
            fb = fwd_fn(b)
            if red == "montgomery":
                from ntt_aie_tpu.ops import modops as M

                fc = M.mont_mul(fa, fb, p, field.mont_neg_pinv)
            else:
                fc = mul_data(fa, fb)
            return _inv_core_flat(fc, scale_poly)

        spectral_to_natural = tw.bit_reverse_indices(n).astype(np.int32)

    # ---- ordering wrappers ----
    if config.ordering == "natural":
        perm = jnp.asarray(spectral_to_natural)
        inv_perm = np.empty(n, dtype=np.int32)
        inv_perm[spectral_to_natural] = np.arange(n, dtype=np.int32)
        inv_perm = jnp.asarray(inv_perm)
        raw_fwd, raw_inv = fwd_fn, inv_fn
        fwd_fn = lambda a: jnp.take(raw_fwd(a), perm)  # noqa: E731
        inv_fn = lambda a: raw_inv(jnp.take(a, inv_perm))  # noqa: E731

    # ---- negacyclic wrappers ----
    nega_fn = None
    if config.negacyclic:
        psi = _u32c(table_form(tw.negacyclic_psi_powers(field, n)))
        psi_inv = _u32c(table_form(tw.negacyclic_psi_powers(field, n, inverse=True)))

        def nega_fn(a, b):
            ta = mul_const(a.astype(jnp.uint32), psi)
            tb = mul_const(b.astype(jnp.uint32), psi)
            tc = polymul_fn(ta, tb)
            return mul_const(tc, psi_inv)

    tables_bytes = sum(
        t.size * 4
        for t in [tw1, itw1]
        + ([tw2, itw2, wmat_dev, iwmat_dev] if n2 > 1 else [])
    )

    return Plan(
        config=config,
        fwd=jax.jit(fwd_fn),
        inv=jax.jit(inv_fn),
        polymul=jax.jit(polymul_fn),
        negacyclic_polymul=jax.jit(nega_fn) if nega_fn else None,
        spectral_to_natural=spectral_to_natural,
        tables_bytes=tables_bytes,
    )


def _build_reference_plan(config: NTTConfig) -> Plan:
    """Bit-exact parity with the reference device (butterfly network with the
    caller's natural-order table + ANS_ORDER_16 block layout)."""
    field = config.field
    n = config.n
    p = field.p
    red = config.resolved_reduction
    mul_const, _, table_form = S.make_mul(red, field)
    table = _u32c(table_form(tw.power_table(field, n)))

    if config.ordering == "reference":
        inv_order = np.empty(16, dtype=np.int32)
        inv_order[ref.ANS_ORDER_16] = np.arange(16, dtype=np.int32)
        inv_order = jnp.asarray(inv_order)

        def fwd_fn(a):
            x = S.reference_network_stages(a.astype(jnp.uint32), table, p, mul_const)
            return jnp.take(x.reshape(16, n // 16), inv_order, axis=0).reshape(n)

    else:

        def fwd_fn(a):
            return S.reference_network_stages(a.astype(jnp.uint32), table, p, mul_const)

    def _no_inverse(*_):
        raise NotImplementedError(
            "reference table convention has no inverse (not a DFT; SURVEY.md §0)"
        )

    return Plan(
        config=config,
        fwd=jax.jit(fwd_fn),
        inv=_no_inverse,
        polymul=_no_inverse,
        negacyclic_polymul=None,
        spectral_to_natural=None,
        tables_bytes=table.size * 4,
    )


def _build_goldilocks_plan(config: NTTConfig) -> Plan:
    raise NotImplementedError("goldilocks device plan lands with the limb kernels")
