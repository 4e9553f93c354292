"""Plan builder: compiles an NTTConfig into jitted device callables.

The forward transform is the four-step decomposition (SURVEY.md §5.7): with
N = N1 x N2 and input viewed row-major as an (N1, N2) matrix,

    fwd = flatten . colDIF_{N2} . transpose . (* W) . colDIF_{N1} . reshape

where colDIF is a fused butterfly column pass (butterflies along sublanes)
and W[r, j2] = omega^(br1(r) * j2) has the DIF output bit-reversal baked in
host-side. The flat output is in a fixed "spectral" order:

    flat[c*N1 + r] = X[br2(c)*N1 + br1(r)]

Pointwise products are order-agnostic, so polymul never permutes; a natural-
order gather is planned only when config.ordering == 'natural'.

The inverse runs the mirror (colDIT passes) with the full 1/N scale — and,
on the Montgomery path, the stray R^-1 from pointwise products — folded into
the inverse twiddle matrix, so no extra passes over the data.

Two interchangeable engines run the column passes:
- 'xla'    — ops/stages.py loops under jit (runs anywhere; also the
             multi-device shard_map building block),
- 'pallas' — ops/pallas_ntt.py fused kernels (single kernel per pass,
             HBM read/written once per pass; the TPU hot path).

Lazy-domain note: with the Harvey reduction, values travel in [0, 2p)
through all passes and are canonicalized exactly once at pipeline exit.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ntt_aie_tpu.config import NTTConfig
from ntt_aie_tpu import twiddles as tw
from ntt_aie_tpu import reference as ref
from ntt_aie_tpu.ops import stages as S
from ntt_aie_tpu.ops.reductions import make_reduction, resolve_kind


@dataclasses.dataclass
class Plan:
    config: NTTConfig
    fwd: Callable
    inv: Callable
    polymul: Callable
    negacyclic_polymul: Optional[Callable]
    spectral_to_natural: Optional[np.ndarray]  # gather indices, or None
    engine: str
    reduction: str
    # True only when the factored-twiddle kernels were actually built
    # (requested wmat_factored can silently downgrade on non-pallas
    # engines or flat splits — callers A/B-ing the mode must check this).
    wmat_factored: bool = False
    # True when the four-step multiply is folded into the transposing
    # pass's exit ('post_t') instead of the next pass's entry — same
    # downgrade caveat as wmat_factored.
    wmat_fold: bool = False
    # make_batched(B) -> dict(fwd=..., inv=..., polymul=...) over (B, n)
    # uint32 arrays. Throughput path: batching amortizes per-dispatch and
    # per-kernel-launch latency (the dominant cost for single transforms on
    # a tunneled chip) and widens the lane dimension.
    # Pallas four-step plans also carry matrix-form callables that skip
    # the flat<->2D boundary retile (~30% of the chained flat pipeline on
    # TPU, scripts/bench_matform.py): `fwd_mat` (B, n1, n2) natural-layout
    # -> (B, n2, n1) spectral and `inv_mat` its converse (spectral-order
    # plans only), plus layout-safe `polymul_mat`/`negacyclic_polymul_mat`
    # over (B, n1, n2) operands. Row-major flattening of a matrix-form
    # array equals the corresponding flat callable's vector bit-exactly.
    _batched_builder: Optional[Callable] = None
    _batched_cache: dict = dataclasses.field(default_factory=dict)
    # Unbatched matrix-form twins (round 5, VERDICT r4 #3): the same
    # contract as the batched `*_mat` callables without the leading batch
    # dim — fwd_mat (n1, n2) natural-layout -> (n2, n1) spectral, inv_mat
    # the converse, polymul_mat/negacyclic_polymul_mat layout-safe. The
    # B=1 serving/latency path: a single flat call pays the boundary
    # retile (~12% of device time at n=2^20 B=1, committed trace); these
    # don't. None on plans without matrix-form kernels (flat split, xla
    # engine) and, for fwd/inv, on ordering='natural' plans (a flat
    # natural-order permutation has no cheap matrix-form equivalent).
    fwd_mat: Optional[Callable] = None
    inv_mat: Optional[Callable] = None
    polymul_mat: Optional[Callable] = None
    negacyclic_polymul_mat: Optional[Callable] = None

    def make_batched(self, batch: int) -> dict:
        if batch not in self._batched_cache:
            if self._batched_builder is None:
                raise NotImplementedError("no batched path for this plan")
            self._batched_cache[batch] = self._batched_builder(batch)
        return self._batched_cache[batch]



def _u32cast(a):
    """Eager-safe uint32 cast: skip the dispatch when already uint32 (an
    eager same-dtype astype still costs a device round trip on axon)."""
    return a if a.dtype == jnp.uint32 else a.astype(jnp.uint32)

def _dev(tables: tuple) -> tuple:
    return tuple(jnp.asarray(np.ascontiguousarray(t)) for t in tables)


def build_plan(config: NTTConfig, *, engine: str = "auto", interpret: bool = False,
               fused: bool = False, wmat_factored: bool | None = None,
               wmat_fold: bool | None = None) -> Plan:
    """engine: 'auto' (pallas on TPU, xla elsewhere), 'pallas', 'xla'.

    fused=True (pallas engine only) runs BOTH four-step passes in one
    whole-matrix kernel (ops/pallas_ntt.build_fused_fourstep). Off by
    default: interleaved A/B on the shared v5e measured parity at best;
    the caller owns the VMEM bound (~12x the matrix size).

    wmat_factored=True (pallas engine) applies the four-step twiddle
    multiply from factored tables (twiddles.fourstep_wfac_T: two chained
    constant multiplies against ~sqrt(n2)-row tables instead of one full
    n1 x n2 matrix — ~16x less twiddle HBM traffic at n=2^20). The
    inverse multiply then rides pass icp2 as 'post' (pre-transpose
    orientation, where rows are the linear exponent axis) instead of
    icp1 'pre'. None = False: the single-chip real-chip A/B was a wash
    (DESIGN.md §3) and full matrices cache on disk, so the single-chip
    default stays full-matrix; the DISTRIBUTED builders default to
    factored, where its wins are unambiguous. Identical canonical
    outputs either way (tested).

    wmat_fold folds the four-step twiddle multiply into the TRANSPOSING
    pass's exit epilogue ('post_t', riding the transposed tile on pass
    1's output store) instead of the next pass's entry — pass 2 becomes
    pure stages + canon, rebalancing the wmat table stream onto the
    pass with HBM headroom. None = True where it applies (pallas
    engine, full-matrix mode; ignored elsewhere): the round-5 A/B
    measured it never worse and better on the inverse (fwd wash, inv
    −4.4%, polymul −1.5% at B=256; DESIGN.md §2), and the folded plan
    builds one fewer kernel. wmat_fold=False keeps the entry placement
    (the A/B arm). The multiply commutes with the inter-pass
    store/load, so outputs are bit-identical either way (tested).
    """
    field = config.field
    kind = resolve_kind(config.reduction, field)

    if config.table_convention == "reference":
        return _build_reference_plan(config, kind)
    if kind == "goldilocks":
        from ntt_aie_tpu.goldilocks_plan import build_goldilocks_plan

        return build_goldilocks_plan(config, engine=engine,
                                     interpret=interpret,
                                     wmat_factored=wmat_factored,
                                     wmat_fold=wmat_fold)

    requested_engine = engine
    if engine == "auto":
        engine = "pallas" if jax.default_backend() == "tpu" else "xla"

    n = config.n
    p = field.p
    red = make_reduction(kind, field)
    n1, n2 = config.split
    if n2 == 1 and requested_engine == "pallas":
        import warnings

        warnings.warn(
            f"engine='pallas' requested but split {config.split} is flat "
            "(no pallas kernels on the flat path; measured faster via XLA "
            "batch-to-lanes). Set rows_log2 for a four-step pallas plan.",
            stacklevel=2,
        )

    @jax.jit
    def _pointwise(fa, fb):
        """Spectral pointwise product (Montgomery leaves a stray R^-1 that
        the iwmat_poly tables fold away in the poly-inverse). Jitted: the
        ~10 elementwise ops of a variable x variable modmul dispatched
        eagerly cost 13x the fused kernel at the n=2^20 B=64 shape on the
        tunneled backend (87.5 ms vs 6.5 ms per call, measured round 2)
        and dominated polymul before this wrapper."""
        if kind == "montgomery":
            from ntt_aie_tpu.ops import modops as M

            return M.mont_mul(fa, fb, p, field.mont_neg_pinv)
        return red.mul_data(fa, fb)

    # Unbatched matrix-form twins; set by the pallas four-step branch
    fwd_mat_fn = inv_mat_fn = polymul_mat_fn = nega_mat_fn = None

    # ---- host-side tables ----
    wfac_on = bool(wmat_factored) if wmat_factored is not None else False
    wfac_on = wfac_on and engine == "pallas" and n2 > 1
    fold_on = (wmat_fold if wmat_fold is not None else True) \
        and engine == "pallas" and n2 > 1 and not fused and not wfac_on
    if n2 > 1:
        if wfac_on and not fused:
            # Factored-twiddle plans apply the four-step multiply from
            # fourstep_wfac_T's sqrt-size tables and never touch the full
            # n1 x n2 matrices — skip their O(n) host build entirely
            # (fused mode still needs wmid, so it keeps the full tables).
            tabs = tw.fourstep_tables_light(field, n1, n2)
            pos = tabs["pos"]
        else:
            tabs = tw.fourstep_tables(field, n1, n2)
            wmat, iwmat_scaled, pos = tabs["wmat"], tabs["iwmat_scaled"], tabs["pos"]
            if kind == "montgomery":
                iwmat_poly = (iwmat_scaled.astype(np.uint64) * np.uint64(field.mont_r_mod_p) % np.uint64(p)).astype(np.int64)
            else:
                iwmat_poly = iwmat_scaled
    else:
        n_inv = field.inv(n)
        scale = np.full(1, n_inv, dtype=object)
        if kind == "montgomery":
            scale_poly = scale * field.mont_r_mod_p % p
        else:
            scale_poly = scale
        pos = tw.spectral_positions(n1, 1)

    # ---- column-pass engines ----
    if n2 > 1 and engine == "pallas":
        from ntt_aie_tpu.ops import pallas_ntt as PN

        # The four-step twiddle multiply rides the SECOND pass as a 'pre'
        # multiply on the transposed matrix: fusing post-twiddle and
        # transposed output into one kernel measured 4x slower than either
        # alone on v5e, while pre-twiddle + plain output is free.
        n_inv = tabs["n_inv"]  # wfac_on hoisted above the table build
        inv_scale_poly = (n_inv * field.mont_r_mod_p % p
                          if kind == "montgomery" else n_inv)
        if wfac_on:
            _pw = tw.root_powers(field, n)  # one O(n) table for all three
            wf_f = tw.fourstep_wfac_T(field, n1, n2, _pows=_pw)
            wf_i = tw.fourstep_wfac_T(field, n1, n2, inverse=True,
                                      scale=n_inv, _pows=_pw)
            wf_ip = (wf_i if inv_scale_poly == n_inv else
                     tw.fourstep_wfac_T(field, n1, n2, inverse=True,
                                        scale=inv_scale_poly, _pows=_pw))
            del _pw

        def _mk_passes(B=1):
            """The four shared column passes (+ poly-inverse variant), at
            batch B. In factored mode the twiddle multiply stays on the
            pass whose ROWS are the linear exponent axis: cp2 'pre'
            (unchanged) and icp2 'post' (pre-transpose) instead of icp1
            'pre' — same elementwise multiply, transposed indexing."""
            kw = dict(reduction=kind, batch=B, interpret=interpret)
            if not fold_on:
                cp1_ = PN.make_colpass(field, n1, n2, direction="dif",
                                       transpose_out=True, **kw)
            if wfac_on:
                cp2_ = PN.make_colpass(field, n2, n1, direction="dif",
                                       wfac=wf_f, wfac_pos="pre",
                                       canonicalize=True, **kw)
                icp2_ = PN.make_colpass(field, n2, n1, direction="dit",
                                        inverse_tw=True, wfac=wf_i,
                                        wfac_pos="post", transpose_out=True,
                                        **kw)
                icp2p_ = (icp2_ if wf_ip is wf_i else
                          PN.make_colpass(field, n2, n1, direction="dit",
                                          inverse_tw=True, wfac=wf_ip,
                                          wfac_pos="post", transpose_out=True,
                                          **kw))
                icp1_ = PN.make_colpass(field, n1, n2, direction="dit",
                                        inverse_tw=True, canonicalize=True,
                                        **kw)
                icp1p_ = icp1_
            elif fold_on:
                # Folded mode: the four-step multiply rides the
                # TRANSPOSING pass's exit ('post_t') — forward on cp1,
                # inverse on icp2 — so cp2/icp1 are pure stages + canon.
                # Bit-identical to the entry placement (the elementwise
                # multiply commutes with the inter-pass store/load).
                cp1_ = PN.make_colpass(field, n1, n2, direction="dif",
                                       transpose_out=True,
                                       wmat=np.ascontiguousarray(wmat.T),
                                       twiddle_pos="post_t", **kw)
                cp2_ = PN.make_colpass(field, n2, n1, direction="dif",
                                       canonicalize=True, **kw)
                icp2_ = PN.make_colpass(field, n2, n1, direction="dit",
                                        inverse_tw=True, transpose_out=True,
                                        wmat=iwmat_scaled,
                                        twiddle_pos="post_t", **kw)
                icp2p_ = (icp2_ if iwmat_poly is iwmat_scaled else
                          PN.make_colpass(field, n2, n1, direction="dit",
                                          inverse_tw=True, transpose_out=True,
                                          wmat=iwmat_poly,
                                          twiddle_pos="post_t", **kw))
                icp1_ = PN.make_colpass(field, n1, n2, direction="dit",
                                        inverse_tw=True, canonicalize=True,
                                        **kw)
                icp1p_ = icp1_
            else:
                cp2_ = PN.make_colpass(field, n2, n1, direction="dif",
                                       wmat=np.ascontiguousarray(wmat.T),
                                       twiddle_pos="pre", canonicalize=True,
                                       **kw)
                icp2_ = PN.make_colpass(field, n2, n1, direction="dit",
                                        inverse_tw=True, transpose_out=True,
                                        **kw)
                icp2p_ = icp2_
                icp1_ = PN.make_colpass(field, n1, n2, direction="dit",
                                        inverse_tw=True, wmat=iwmat_scaled,
                                        twiddle_pos="pre", canonicalize=True,
                                        **kw)
                icp1p_ = PN.make_colpass(field, n1, n2, direction="dit",
                                         inverse_tw=True, wmat=iwmat_poly,
                                         twiddle_pos="pre", canonicalize=True,
                                         **kw)
            return cp1_, cp2_, icp2_, icp2p_, icp1_, icp1p_

        cp1, cp2, icp2, icp2p, icp1, icp1_poly = _mk_passes()

        def fwd_fn(a):
            x = a.astype(jnp.uint32).reshape(n1, n2)
            return cp2(cp1(x)).reshape(n)

        def _inv_core(a, icp2_, icp1_):
            x = a.astype(jnp.uint32).reshape(n2, n1)
            return icp1_(icp2_(x)).reshape(n)

        inv_fn = lambda a: _inv_core(a, icp2, icp1)  # noqa: E731
        inv_poly_fn = lambda a: _inv_core(a, icp2p, icp1_poly)  # noqa: E731

        fused_ok = fused  # see build_plan docstring
        if fused_ok:
            wmid_fwd = np.ascontiguousarray(wmat.T)

            def _mk_fused(B=1, **kw):
                return PN.make_fused_fourstep(field, n1, n2, reduction=kind,
                                              batch=B, interpret=interpret, **kw)

            ff = _mk_fused(wmid=wmid_fwd)
            fi = _mk_fused(wmid=iwmat_scaled, inverse=True)
            fip = _mk_fused(wmid=iwmat_poly, inverse=True)
            fwd_fn = lambda a: ff(a.astype(jnp.uint32).reshape(n1, n2)).reshape(n)  # noqa: E731
            inv_fn = lambda a: fi(a.astype(jnp.uint32).reshape(n2, n1)).reshape(n)  # noqa: E731
            inv_poly_fn = lambda a: fip(a.astype(jnp.uint32).reshape(n2, n1)).reshape(n)  # noqa: E731

        # Unbatched matrix-form twins (Plan.fwd_mat contract): the same
        # kernels with no flat boundary reshape — (n1, n2) natural-layout
        # in, (n2, n1) spectral out (and converse). The B=1 serving path.
        if fused_ok:
            fwd_mat_fn = lambda a: ff(_u32cast(a))  # noqa: E731
            inv_mat_fn = lambda a: fi(_u32cast(a))  # noqa: E731

            def polymul_mat_fn(a, b):
                return fip(_pointwise(ff(_u32cast(a)), ff(_u32cast(b))))
        else:
            def _fwd2d(a):
                return cp2(cp1(_u32cast(a)))

            fwd_mat_fn = _fwd2d
            inv_mat_fn = lambda a: icp1(icp2(_u32cast(a)))  # noqa: E731

            def polymul_mat_fn(a, b):
                return icp1_poly(icp2p(_pointwise(_fwd2d(a), _fwd2d(b))))

        def batched_builder(B):
            # On TPU the flat (B, n) <-> (B, n1, n2) boundary reshape is a
            # PHYSICAL retile (the last dim is the lane axis), measured at
            # ~30% of the chained pipeline at n=2^20 B=256
            # (scripts/bench_matform.py, DESIGN.md §3). The builders
            # therefore (a) keep every internal composition in matrix form
            # — polymul's pointwise product is elementwise, so it runs on
            # the (.., n2, n1) spectral matrices directly — and (b) expose
            # matrix-form callables (`fwd_mat` etc.) so device-resident
            # serving pipelines never pay the retile at all. Contract:
            # fwd_mat (B, n1, n2) natural-layout -> (B, n2, n1) spectral
            # (row-major flattening = the flat spectral vector); inv_mat is
            # the exact converse; polymul_mat maps natural-layout operands
            # to a natural-layout product.
            bsh = (n1, n2) if B == 1 else (B, n1, n2)
            ish = (n2, n1) if B == 1 else (B, n2, n1)
            if fused_ok:
                ffb = _mk_fused(B, wmid=wmid_fwd)
                fib = _mk_fused(B, wmid=iwmat_scaled, inverse=True)
                fipb = _mk_fused(B, wmid=iwmat_poly, inverse=True)

                def fwd2d_b(a, _f=ffb):
                    return _f(_u32cast(a).reshape(bsh))

                def inv2d_b(a, _f=fib):
                    return _f(_u32cast(a).reshape(ish))

                def fwd_b(a):
                    return fwd2d_b(a).reshape(B, n)

                def inv_b(a):
                    return inv2d_b(a).reshape(B, n)

                def _poly_core(a, b):
                    fc = _pointwise(fwd2d_b(a), fwd2d_b(b))
                    return fipb(fc)

                def polymul_b(a, b):
                    return _poly_core(a, b).reshape(B, n)

                out = {"polymul": polymul_b,
                       "polymul_mat":
                       lambda a, b: _poly_core(a, b).reshape(B, n1, n2)}
                if config.negacyclic:
                    psi_m = tw.negacyclic_psi_powers(field, n).reshape(n1, n2)
                    psi_im = tw.negacyclic_psi_powers(
                        field, n, inverse=True).reshape(n1, n2)
                    nfb = _mk_fused(B, wmid=wmid_fwd, pre=psi_m)
                    nib = _mk_fused(B, wmid=iwmat_poly, inverse=True,
                                    post=psi_im)

                    def _nega_core(a, b):
                        fa = nfb(_u32cast(a).reshape(bsh))
                        fb = nfb(_u32cast(b).reshape(bsh))
                        return nib(_pointwise(fa, fb))

                    def nega_b(a, b):
                        return _nega_core(a, b).reshape(B, n)

                    out["negacyclic_polymul"] = nega_b
                    out["negacyclic_polymul_mat"] = (
                        lambda a, b: _nega_core(a, b).reshape(B, n1, n2))
                if config.ordering == "bitrev":
                    # spectral-order plans only: a natural-order flat
                    # permutation has no cheap matrix-form equivalent
                    out["fwd_mat"] = lambda a: fwd2d_b(a).reshape(B, n2, n1)
                    out["inv_mat"] = lambda a: inv2d_b(a).reshape(B, n1, n2)
                if config.ordering == "natural":
                    raw_fwd_bf, raw_inv_bf = fwd_b, inv_b
                    fwd_b = lambda a: jnp.take(raw_fwd_bf(a), perm, axis=1)  # noqa: E731
                    inv_b = lambda a: raw_inv_bf(jnp.take(a, inv_perm, axis=1))  # noqa: E731
                out["fwd"] = fwd_b
                out["inv"] = inv_b
                return out

            cp1b, cp2b, icp2b, icp2pb, icp1b, icp1pb = _mk_passes(B)

            # B == 1 builds the unbatched 2-D kernels (no batch grid axis),
            # so the entry reshape (bsh/ish above) drops the leading dim in
            # that case. Internal compositions stay in matrix form — the
            # column passes chain 2D -> 2D, so only the flat API boundary
            # pays the retile (see the fused-branch comment).
            def fwd2d_b(a):
                return cp2b(cp1b(_u32cast(a).reshape(bsh)))

            def inv2d_core(a, icp2_, icp):
                return icp(icp2_(_u32cast(a).reshape(ish)))

            def fwd_b(a):
                return fwd2d_b(a).reshape(B, n)

            # polymul composes the raw spectral-order passes directly (the
            # natural-ordering wrapper below only rebinds the fwd_b/inv_b
            # names): pointwise products are order-agnostic and run on the
            # spectral matrices with no intermediate flattening.
            def _poly_core(a, b):
                fc = _pointwise(fwd2d_b(a), fwd2d_b(b))
                return icp1pb(icp2pb(fc))

            def polymul_b(a, b):
                return _poly_core(a, b).reshape(B, n)

            # NOT jit-wrapped: on the tunneled axon backend an explicit jit
            # wrapper around pallas custom-calls adds ~28 ms per dispatch
            # (remote-compile round trip); the bare composition dispatches
            # each kernel through the fast path. Callers can still jit.
            inv_b = lambda a: inv2d_core(a, icp2b, icp1b).reshape(B, n)  # noqa: E731
            out = {"polymul": polymul_b,
                   "polymul_mat":
                   lambda a, b: _poly_core(a, b).reshape(B, n1, n2)}
            if config.ordering == "bitrev":
                out["fwd_mat"] = lambda a: fwd2d_b(a).reshape(B, n2, n1)
                out["inv_mat"] = (
                    lambda a: inv2d_core(a, icp2b, icp1b).reshape(B, n1, n2))
            if config.negacyclic:
                if wfac_on:
                    # rank-1 psi operands (1-D vectors instead of the
                    # full n1 x n2 psi matrix); the poly-scale four-step
                    # multiply already rode icp2pb 'post', so the last
                    # pass only adds psi^-1
                    psi_fac = tw.negacyclic_psi_factors(field, n1, n2)
                    ipsi_fac = tw.negacyclic_psi_factors(field, n1, n2,
                                                         inverse=True)
                    ncp1b = PN.make_colpass(field, n1, n2, reduction=kind,
                                            direction="dif", rank1=psi_fac,
                                            rank1_pos="pre",
                                            transpose_out=True, batch=B,
                                            interpret=interpret)
                    nicp1b = PN.make_colpass(field, n1, n2, reduction=kind,
                                             direction="dit", inverse_tw=True,
                                             rank1=ipsi_fac, rank1_pos="post",
                                             canonicalize=True, batch=B,
                                             interpret=interpret)
                else:
                    psi_mat = tw.negacyclic_psi_powers(field, n).reshape(n1, n2)
                    psi_inv_mat = tw.negacyclic_psi_powers(
                        field, n, inverse=True).reshape(n1, n2)
                    if fold_on:
                        # psi 'pre' + the folded four-step wmat 'post_t'
                        # on pass 1; the poly-scale inverse multiply
                        # already rides icp2pb 'post_t', so the last
                        # pass only adds psi^-1
                        ncp1b = PN.make_colpass(
                            field, n1, n2, reduction=kind, direction="dif",
                            wmat=psi_mat, twiddle_pos="pre",
                            wmat2=np.ascontiguousarray(wmat.T),
                            twiddle_pos2="post_t", transpose_out=True,
                            batch=B, interpret=interpret)
                        nicp1b = PN.make_colpass(
                            field, n1, n2, reduction=kind, direction="dit",
                            inverse_tw=True, wmat=psi_inv_mat,
                            twiddle_pos="post", canonicalize=True,
                            batch=B, interpret=interpret)
                    else:
                        ncp1b = PN.make_colpass(field, n1, n2, reduction=kind,
                                                direction="dif", wmat=psi_mat,
                                                twiddle_pos="pre",
                                                transpose_out=True,
                                                batch=B, interpret=interpret)
                        nicp1b = PN.make_colpass(field, n1, n2, reduction=kind,
                                                 direction="dit", inverse_tw=True,
                                                 wmat=iwmat_poly, twiddle_pos="pre",
                                                 wmat2=psi_inv_mat, twiddle_pos2="post",
                                                 canonicalize=True, batch=B,
                                                 interpret=interpret)

                def _nega_core(a, b):
                    fa = cp2b(ncp1b(_u32cast(a).reshape(bsh)))
                    fb = cp2b(ncp1b(_u32cast(b).reshape(bsh)))
                    return nicp1b(icp2pb(_pointwise(fa, fb)))

                def nega_b(a, b):
                    return _nega_core(a, b).reshape(B, n)

                out["negacyclic_polymul"] = nega_b
                out["negacyclic_polymul_mat"] = (
                    lambda a, b: _nega_core(a, b).reshape(B, n1, n2))
            if config.ordering == "natural":
                # honor the ordering wrapper exactly like the unbatched
                # callables (perm/inv_perm bound below, before any call)
                raw_fwd_b, raw_inv_b = fwd_b, inv_b
                fwd_b = lambda a: jnp.take(raw_fwd_b(a), perm, axis=1)  # noqa: E731
                inv_b = lambda a: raw_inv_b(jnp.take(a, inv_perm, axis=1))  # noqa: E731
            out["fwd"] = fwd_b
            out["inv"] = inv_b
            return out

    elif n2 > 1:  # xla engine
        from ntt_aie_tpu.ops import pallas_ntt as PN

        # Column transforms from the shared col_network schedule (nested
        # for columns >= 256 — same spectral order as the Pallas engine
        # by construction).
        col1 = PN.make_col_transform(field, n1, direction="dif", red=red)
        col2 = PN.make_col_transform(field, n2, direction="dif", red=red)
        icol1 = PN.make_col_transform(field, n1, direction="dit",
                                      inverse=True, red=red)
        icol2 = PN.make_col_transform(field, n2, direction="dit",
                                      inverse=True, red=red)
        wmat_dev = _dev(red.prep_mat(wmat))
        iwmat_dev = _dev(red.prep_mat(iwmat_scaled))
        iwmat_poly_dev = _dev(red.prep_mat(iwmat_poly))

        def fwd_fn(a):
            x = a.astype(jnp.uint32).reshape(n1, n2)
            x = col1(x)
            x = red.mulc_mat(x, *wmat_dev)
            x = x.T
            x = col2(x)
            return red.canonicalize(x).reshape(n)

        def _inv_core(a, iw):
            x = a.astype(jnp.uint32).reshape(n2, n1)
            x = icol2(x)
            x = x.T
            x = red.mulc_mat(x, *iw)
            x = icol1(x)
            return red.canonicalize(x).reshape(n)

        inv_fn = lambda a: _inv_core(a, iwmat_dev)  # noqa: E731
        inv_poly_fn = lambda a: _inv_core(a, iwmat_poly_dev)  # noqa: E731

    else:  # flat path (small n): plain DIF/DIT on (n, 1), xla engine
        tw1 = _dev(red.prepare_table(tw.pack_stage_twiddles(tw.dif_stage_twiddles(field, n1), n1)))
        itw1 = _dev(red.prepare_table(tw.pack_stage_twiddles(tw.dit_stage_twiddles(field, n1, inverse=True), n1)))
        scale_dev = _dev(red.prepare_table(scale))
        scale_poly_dev = _dev(red.prepare_table(scale_poly))
        engine = "xla"

        def fwd_fn(a):
            x = a.astype(jnp.uint32).reshape(n1, 1)
            x = S.dif_stages(x, tw1, p, red)
            return red.canonicalize(x).reshape(n)

        def _inv_core(a, sc):
            x = a.astype(jnp.uint32).reshape(n1, 1)
            x = S.dit_stages(x, itw1, p, red)
            x = red.mul_const(x, *(s.reshape(1, 1) for s in sc))
            return red.canonicalize(x).reshape(n)

        inv_fn = lambda a: _inv_core(a, scale_dev)  # noqa: E731
        inv_poly_fn = lambda a: _inv_core(a, scale_poly_dev)  # noqa: E731

        # Batch-to-lanes layout: a (B, n) batch transposes to (n, B) so the
        # batch rides the 128-lane axis and butterflies ride sublanes —
        # full SIMD for small crypto-sized transforms (a vmap of the (n, 1)
        # path would waste 127 of 128 lanes). The serving shape for
        # Kyber/Dilithium-sized rings.
        def batched_builder(B):
            # (n, B)-domain cores; the public callables transpose at the
            # boundary and are jitted as COMPOSED functions (including the
            # ordering wrapper) so each call is one dispatch.
            def fwd_cols(x):               # (n, B) -> (n, B)
                return red.canonicalize(S.dif_stages(x, tw1, p, red))

            def inv_cols(x, sc):           # (n, B) -> (n, B)
                x = S.dit_stages(x, itw1, p, red)
                x = red.mul_const(x, *(s.reshape(1, 1) for s in sc))
                return red.canonicalize(x)

            def fwd_b(a):
                return fwd_cols(_u32cast(a).reshape(B, n).T).T

            def inv_b(a):
                return inv_cols(_u32cast(a).reshape(B, n).T, scale_dev).T

            def polymul_b(a, b):
                fa = fwd_cols(_u32cast(a).reshape(B, n).T)
                fb = fwd_cols(_u32cast(b).reshape(B, n).T)
                return inv_cols(_pointwise(fa, fb), scale_poly_dev).T

            out = {"polymul": jax.jit(polymul_b)}
            if config.negacyclic:
                psi_b = _dev(red.prepare_table(
                    tw.negacyclic_psi_powers(field, n).reshape(-1, 1)))
                psi_inv_b = _dev(red.prepare_table(
                    tw.negacyclic_psi_powers(field, n, inverse=True).reshape(-1, 1)))

                def nega_b(a, b):
                    ta = red.canonicalize(red.mul_const(
                        _u32cast(a).reshape(B, n).T, *psi_b))
                    tb = red.canonicalize(red.mul_const(
                        _u32cast(b).reshape(B, n).T, *psi_b))
                    tc = inv_cols(_pointwise(fwd_cols(ta), fwd_cols(tb)),
                                  scale_poly_dev)
                    return red.canonicalize(
                        red.mul_const(tc, *psi_inv_b)).T

                out["negacyclic_polymul"] = jax.jit(nega_b)
            if config.ordering == "natural":
                raw_fwd_fb, raw_inv_fb = fwd_b, inv_b
                fwd_b = lambda a: jnp.take(raw_fwd_fb(a), perm, axis=1)  # noqa: E731
                inv_b = lambda a: raw_inv_fb(jnp.take(a, inv_perm, axis=1))  # noqa: E731
            out["fwd"] = jax.jit(fwd_b)
            out["inv"] = jax.jit(inv_b)
            return out

    # _fwd/_inv bind the *spectral-order* callables now, before the ordering
    # wrappers rebind fwd_fn below: pointwise products are order-agnostic, so
    # polymul always runs in spectral order regardless of config.ordering.
    def polymul_fn(a, b, _fwd=fwd_fn, _inv=inv_poly_fn):
        fa = _fwd(a)
        fb = _fwd(b)
        fc = _pointwise(fa, fb)
        return _inv(fc)

    spectral_to_natural = pos

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
    if config.negacyclic and n2 > 1 and engine == "pallas":
        # Fully fused RLWE pipeline: psi^j rides pass 1 as a second 'pre'
        # multiply and psi^-j rides the last inverse pass as a 'post'
        # multiply — zero extra HBM round trips vs the cyclic polymul.
        if fused_ok or not wfac_on:
            psi_mat = tw.negacyclic_psi_powers(field, n).reshape(n1, n2)
            psi_inv_mat = tw.negacyclic_psi_powers(field, n, inverse=True).reshape(n1, n2)
        if fused_ok:
            nf = _mk_fused(wmid=wmid_fwd, pre=psi_mat)
            ni = _mk_fused(wmid=iwmat_poly, inverse=True, post=psi_inv_mat)

            def _nega_fwd(a):
                return nf(a.astype(jnp.uint32).reshape(n1, n2)).reshape(n)

            def _nega_inv(fc):
                return ni(_u32cast(fc).reshape(n2, n1)).reshape(n)

        else:
            if wfac_on:
                # rank-1 psi operands; four-step poly-scale multiply
                # already rides icp2p 'post'
                psi_fac = tw.negacyclic_psi_factors(field, n1, n2)
                ipsi_fac = tw.negacyclic_psi_factors(field, n1, n2,
                                                     inverse=True)
                ncp1 = PN.make_colpass(field, n1, n2, reduction=kind,
                                       direction="dif", rank1=psi_fac,
                                       rank1_pos="pre", transpose_out=True,
                                       interpret=interpret)
                nicp1 = PN.make_colpass(field, n1, n2, reduction=kind,
                                        direction="dit", inverse_tw=True,
                                        rank1=ipsi_fac, rank1_pos="post",
                                        canonicalize=True, interpret=interpret)
            elif fold_on:
                # see batched_builder's fold branch: wmat rides ncp1
                # 'post_t'; the poly-scale inverse rides icp2p 'post_t'
                ncp1 = PN.make_colpass(field, n1, n2, reduction=kind,
                                       direction="dif", wmat=psi_mat,
                                       twiddle_pos="pre",
                                       wmat2=np.ascontiguousarray(wmat.T),
                                       twiddle_pos2="post_t",
                                       transpose_out=True, interpret=interpret)
                nicp1 = PN.make_colpass(field, n1, n2, reduction=kind,
                                        direction="dit", inverse_tw=True,
                                        wmat=psi_inv_mat, twiddle_pos="post",
                                        canonicalize=True, interpret=interpret)
            else:
                ncp1 = PN.make_colpass(field, n1, n2, reduction=kind,
                                       direction="dif", wmat=psi_mat,
                                       twiddle_pos="pre", transpose_out=True,
                                       interpret=interpret)
                nicp1 = PN.make_colpass(field, n1, n2, reduction=kind,
                                        direction="dit", inverse_tw=True,
                                        wmat=iwmat_poly, twiddle_pos="pre",
                                        wmat2=psi_inv_mat, twiddle_pos2="post",
                                        canonicalize=True, interpret=interpret)

            def _nega_fwd(a):
                x = a.astype(jnp.uint32).reshape(n1, n2)
                return cp2(ncp1(x)).reshape(n)

            def _nega_inv(fc):
                return nicp1(icp2p(fc.reshape(n2, n1))).reshape(n)

        def nega_fn(a, b):
            fa = _nega_fwd(a)
            fb = _nega_fwd(b)
            fc = _pointwise(fa, fb)
            return _nega_inv(fc)

        # matrix-form twin: same kernels, no flat boundary reshapes
        if fused_ok:
            def nega_mat_fn(a, b):
                return ni(_pointwise(nf(_u32cast(a)), nf(_u32cast(b))))
        else:
            def nega_mat_fn(a, b):
                fa = cp2(ncp1(_u32cast(a)))
                fb = cp2(ncp1(_u32cast(b)))
                return nicp1(icp2p(_pointwise(fa, fb)))

    elif config.negacyclic:
        psi = _dev(red.prepare_table(tw.negacyclic_psi_powers(field, n)))
        psi_inv = _dev(red.prepare_table(tw.negacyclic_psi_powers(field, n, inverse=True)))

        def nega_fn(a, b):
            ta = red.canonicalize(red.mul_const(a.astype(jnp.uint32), *psi))
            tb = red.canonicalize(red.mul_const(b.astype(jnp.uint32), *psi))
            tc = polymul_fn(ta, tb)
            return red.canonicalize(red.mul_const(tc, *psi_inv))

    if "batched_builder" not in dir():
        def batched_builder(B):
            out = {
                "fwd": jax.jit(jax.vmap(fwd_fn)),
                "inv": jax.jit(jax.vmap(inv_fn)),
                "polymul": jax.jit(jax.vmap(polymul_fn)),
            }
            if nega_fn is not None:  # engine-portable with the pallas dict
                out["negacyclic_polymul"] = jax.jit(jax.vmap(nega_fn))
            return out

    spectral = config.ordering == "bitrev"
    return Plan(
        config=config,
        fwd=jax.jit(fwd_fn),
        inv=jax.jit(inv_fn),
        polymul=jax.jit(polymul_fn),
        negacyclic_polymul=jax.jit(nega_fn) if nega_fn else None,
        spectral_to_natural=spectral_to_natural,
        engine=engine,
        reduction=kind,
        wmat_factored=wfac_on,
        wmat_fold=fold_on,
        _batched_builder=batched_builder,
        # fwd/inv twins are spectral-order only (batched-dict convention)
        fwd_mat=fwd_mat_fn if spectral else None,
        inv_mat=inv_mat_fn if spectral else None,
        polymul_mat=polymul_mat_fn,
        negacyclic_polymul_mat=nega_mat_fn,
    )


def _build_reference_plan(config: NTTConfig, kind: str) -> Plan:
    """Bit-exact parity with the reference device (butterfly network with the
    caller's natural-order table + ANS_ORDER_16 block layout)."""
    field = config.field
    n = config.n
    p = field.p
    red = make_reduction(kind, field)
    table = _dev(red.prepare_table(tw.power_table(field, n)))

    if config.ordering == "reference":
        inv_order = np.empty(16, dtype=np.int32)
        inv_order[ref.ANS_ORDER_16] = np.arange(16, dtype=np.int32)
        inv_order = jnp.asarray(inv_order)

        def fwd_fn(a):
            x = S.reference_network_stages(a.astype(jnp.uint32), table, p, red)
            return jnp.take(x.reshape(16, n // 16), inv_order, axis=0).reshape(n)

    else:

        def fwd_fn(a):
            return S.reference_network_stages(a.astype(jnp.uint32), table, p, red)

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
        engine="xla",
        reduction=kind,
    )
