"""Device plan for the Goldilocks field p = 2^64 - 2^32 + 1.

TPU lanes are 32-bit, so 64-bit field elements travel as (hi, lo) uint32
limb pairs (SURVEY.md §7 hard part 1 taken one word wider: where the 32-bit
primes emulate the reference's acc64 with 16-bit limb products, Goldilocks
stacks that into a 4-partial-product 128-bit multiply reduced with
2^64 ≡ 2^32 - 1, 2^96 ≡ -1 — ops/modops.py gl_*). The transform structure
is the same four-step decomposition as plan.py:

    fwd = flatten . colDIF_{N2} . transpose . (* W) . colDIF_{N1} . reshape

with the 1/n inverse scale (and nothing else — no Montgomery stray factors;
gl_mul is a plain modmul) folded into the inverse twiddle matrix.

Value interface: every plan callable accepts either
- a ``(hi, lo)`` tuple of uint32 arrays (device-resident form), returning a
  tuple, or
- a NumPy ``uint64`` array (host convenience), returning ``uint64``.

The limb-pair form is what jit sees; the uint64 conversion happens on host.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ntt_aie_tpu.config import NTTConfig
from ntt_aie_tpu import twiddles as tw
from ntt_aie_tpu.ops import modops as M


def _split_limbs(t: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint64/object array of field elements -> (hi, lo) uint32 arrays.

    Vectorized (round 4): every Goldilocks value fits uint64 exactly, and
    NumPy converts object arrays of ints in [0, 2^64) to uint64 directly —
    the old per-element Python loop was a measured plan-setup cost on top
    of the table build at n >= 2^22."""
    flat = np.asarray(t)
    if flat.dtype != np.uint64:
        flat = flat.astype(np.uint64)
    hi = (flat >> np.uint64(32)).astype(np.uint32)
    lo = (flat & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return np.ascontiguousarray(hi), np.ascontiguousarray(lo)


def _dev_limbs(t: np.ndarray):
    hi, lo = _split_limbs(t)
    return jnp.asarray(hi), jnp.asarray(lo)


def gl_dif_stages(h, l, twh, twl):
    """Gentleman-Sande DIF along axis 0 on limb pairs; natural row order in,
    bit-reversed out. h, l: (n, C) uint32; twh/twl: (log2 n, n//2) packed
    stage tables (twiddles.pack_stage_twiddles layout)."""
    n, c = h.shape
    logn = n.bit_length() - 1
    for s in range(logn):
        t = n >> (s + 1)
        blocks = n // (2 * t)
        hr = h.reshape(blocks, 2, t, c)
        lr = l.reshape(blocks, 2, t, c)
        uh, ul = hr[:, 0], lr[:, 0]
        vh, vl = hr[:, 1], lr[:, 1]
        ah, al = M.gl_add(uh, ul, vh, vl)
        dh, dl = M.gl_sub(uh, ul, vh, vl)
        wh = twh[s].reshape(blocks, t, 1)
        wl = twl[s].reshape(blocks, t, 1)
        bh, bl = M.gl_mul(dh, dl, wh, wl)
        h = jnp.stack([ah, bh], axis=1).reshape(n, c)
        l = jnp.stack([al, bl], axis=1).reshape(n, c)
    return h, l


def gl_dit_stages(h, l, twh, twl):
    """Cooley-Tukey DIT along axis 0 on limb pairs; bit-reversed in,
    natural out."""
    n, c = h.shape
    logn = n.bit_length() - 1
    for s in range(logn):
        t = 1 << s
        blocks = n // (2 * t)
        hr = h.reshape(blocks, 2, t, c)
        lr = l.reshape(blocks, 2, t, c)
        uh, ul = hr[:, 0], lr[:, 0]
        vh, vl = hr[:, 1], lr[:, 1]
        wh = twh[s].reshape(blocks, t, 1)
        wl = twl[s].reshape(blocks, t, 1)
        wvh, wvl = M.gl_mul(vh, vl, wh, wl)
        ah, al = M.gl_add(uh, ul, wvh, wvl)
        bh, bl = M.gl_sub(uh, ul, wvh, wvl)
        h = jnp.stack([ah, bh], axis=1).reshape(n, c)
        l = jnp.stack([al, bl], axis=1).reshape(n, c)
    return h, l


def _pack_dev(field, n, *, direction, inverse=False):
    gen = tw.dif_stage_twiddles if direction == "dif" else tw.dit_stage_twiddles
    packed = tw.pack_stage_twiddles(gen(field, n, inverse=inverse), n)
    return _dev_limbs(packed)


def gl_col_transform(field, nn: int, *, direction: str,
                     inverse: bool = False):
    """Pure-jnp GL column transform over (h, l) limb pairs of shape
    (nn, c) — compiled from the SAME twiddles.col_network schedule as the
    32-bit engines and the Pallas GL kernels (nested full-occupancy
    phases for nn >= 256 columns), so the spectral order cannot diverge
    between value widths or engines. The stage loops are the radix-2
    gl_dif/dit_stages bodies with explicit stride lists; the nested mid
    step is a gl_mul by the flat wmid limb pair plus the (R, S)
    sublane-block row transpose (DIT runs the exact mirror)."""
    net = tw.col_network(field, nn, direction=direction, inverse=inverse)
    phases = []
    for ph in net["phases"]:
        phases.append((list(ph["ts"]),
                       [_dev_limbs(v.reshape(-1, 1)) for v in ph["vecs"]]))
    wmid_hl = (_dev_limbs(net["mid"]["wmid"].reshape(-1, 1))
               if net["mid"] is not None else None)
    R, S = net["R"], net["S"]

    def _stages(h, l, ts, vecs):
        n_, c = h.shape
        for t, (wh, wl) in zip(ts, vecs):
            blocks = n_ // (2 * t)
            hr = h.reshape(blocks, 2, t, c)
            lr = l.reshape(blocks, 2, t, c)
            uh, ul = hr[:, 0], lr[:, 0]
            vh, vl = hr[:, 1], lr[:, 1]
            w_h = wh.reshape(1, t, 1)
            w_l = wl.reshape(1, t, 1)
            if direction == "dif":
                ah, al = M.gl_add(uh, ul, vh, vl)
                dh, dl = M.gl_sub(uh, ul, vh, vl)
                bh, bl = M.gl_mul(dh, dl, w_h, w_l)
            else:
                wvh, wvl = M.gl_mul(vh, vl, w_h, w_l)
                ah, al = M.gl_add(uh, ul, wvh, wvl)
                bh, bl = M.gl_sub(uh, ul, wvh, wvl)
            h = jnp.stack([ah, bh], axis=1).reshape(n_, c)
            l = jnp.stack([al, bl], axis=1).reshape(n_, c)
        return h, l

    def run(h, l):
        c = h.shape[1]
        h, l = _stages(h, l, *phases[0])
        if wmid_hl is not None:
            if direction == "dif":
                h, l = M.gl_mul(h, l, wmid_hl[0], wmid_hl[1])
                h = h.reshape(R, S, c).swapaxes(0, 1).reshape(nn, c)
                l = l.reshape(R, S, c).swapaxes(0, 1).reshape(nn, c)
            else:
                h = h.reshape(S, R, c).swapaxes(0, 1).reshape(nn, c)
                l = l.reshape(S, R, c).swapaxes(0, 1).reshape(nn, c)
                h, l = M.gl_mul(h, l, wmid_hl[0], wmid_hl[1])
            h, l = _stages(h, l, *phases[1])
        return h, l

    return run


def build_goldilocks_plan(config: NTTConfig, *, engine: str = "auto",
                          interpret: bool = False,
                          wmat_factored: bool | None = None,
                          wmat_fold: bool | None = None):
    """Goldilocks plan. Two engines for the four-step column passes:
    'pallas' (ops/pallas_gl.py fused limb kernels — the TPU hot path) and
    'xla' (the gl_dif/dit_stages loops below; runs anywhere).

    wmat_factored=True (pallas engine, round 4) applies the four-step
    twiddle multiply from factored sqrt-size limb tables
    (twiddles.fourstep_wfac_T) instead of the full n1 x n2 limb-pair
    matrices — GL is where full matrices hurt most (two limb planes per
    operand; the object-array build measured 3.3 s at n=2^22 before the
    round-4 vectorized builder). The inverse multiply rides icp2 'post'
    like the 32-bit plan. None = False (full-matrix, the measured
    single-chip default); outputs bit-identical either way (tested).

    wmat_fold (pallas engine, full-matrix mode) is the GL limb analog
    of plan.py's round-5 fold: the four-step gl_mul rides the
    TRANSPOSING pass's exit ('post_t') — forward on cp1, inverse on
    icp2 — instead of the next pass's entry. Bit-identical (the
    multiply commutes with the inter-pass store/load; tested).
    None = True where it applies, like the 32-bit plan: the GL A/B
    (scripts/bench_gl_fold.py, one session interleaved) read never
    worse — fwd 1337/1361 vs 1350/1461 µs/NTT, inv 1078/1113 vs
    1117/1164 (−2..−7%). False keeps the entry placement (A/B arm)."""
    from ntt_aie_tpu.plan import Plan  # avoid import cycle at module load

    if engine == "auto":
        engine = "pallas" if jax.default_backend() == "tpu" else "xla"

    field = config.field
    n = config.n
    p = field.p
    n1, n2 = config.split
    make_batched_cores = None  # set by the pallas four-step branch
    fwd_mat_core = None        # unbatched matrix-form twins, same branch
    wfac_on = bool(wmat_factored) if wmat_factored is not None else False
    wfac_on = wfac_on and engine == "pallas" and n2 > 1
    fold_on = (wmat_fold if wmat_fold is not None else True) \
        and engine == "pallas" and n2 > 1 and not wfac_on

    if n2 > 1:
        if wfac_on:
            tabs = tw.fourstep_tables_light(field, n1, n2)
            pos = tabs["pos"]
            _pw = tw.root_powers(field, n)  # one O(n) table for both
            wf_f = tw.fourstep_wfac_T(field, n1, n2, _pows=_pw)
            wf_i = tw.fourstep_wfac_T(field, n1, n2, inverse=True,
                                      scale=tabs["n_inv"], _pows=_pw)
            del _pw
        else:
            tabs = tw.fourstep_tables(field, n1, n2)
            wmat, iwmat_scaled, pos = (tabs["wmat"], tabs["iwmat_scaled"],
                                       tabs["pos"])

        if engine == "pallas":
            from ntt_aie_tpu.ops.pallas_gl import make_gl_colpass

            # Same fused-pass structure as the 32-bit plan (plan.py): the
            # four-step twiddle rides the SECOND pass as a 'pre' multiply on
            # the transposed matrix; pass 1 fuses the transpose into its
            # output write. Factored mode: cp2 applies the sqrt-size
            # tables 'pre'; the inverse multiply moves to icp2 'post'
            # (pre-transpose orientation, where rows are the linear
            # exponent axis) and icp1 carries no table.
            def _mk_passes_gl(B=1):
                kwb = dict(batch=B, interpret=interpret)
                if not fold_on:
                    cp1_ = make_gl_colpass(field, n1, n2, direction="dif",
                                           transpose_out=True, **kwb)
                if wfac_on:
                    cp2_ = make_gl_colpass(field, n2, n1, direction="dif",
                                           wfac=wf_f, wfac_pos="pre", **kwb)
                    icp2_ = make_gl_colpass(field, n2, n1, direction="dit",
                                            inverse_tw=True, wfac=wf_i,
                                            wfac_pos="post",
                                            transpose_out=True, **kwb)
                    icp1_ = make_gl_colpass(field, n1, n2, direction="dit",
                                            inverse_tw=True, **kwb)
                elif fold_on:
                    # fold: the four-step gl_mul rides the transposing
                    # pass's exit ('post_t'); the other pass is stages-only
                    cp1_ = make_gl_colpass(field, n1, n2, direction="dif",
                                           transpose_out=True,
                                           wmat=np.ascontiguousarray(wmat.T),
                                           twiddle_pos="post_t", **kwb)
                    cp2_ = make_gl_colpass(field, n2, n1, direction="dif",
                                           **kwb)
                    icp2_ = make_gl_colpass(field, n2, n1, direction="dit",
                                            inverse_tw=True,
                                            transpose_out=True,
                                            wmat=iwmat_scaled,
                                            twiddle_pos="post_t", **kwb)
                    icp1_ = make_gl_colpass(field, n1, n2, direction="dit",
                                            inverse_tw=True, **kwb)
                else:
                    cp2_ = make_gl_colpass(field, n2, n1, direction="dif",
                                           wmat=np.ascontiguousarray(wmat.T),
                                           twiddle_pos="pre", **kwb)
                    icp2_ = make_gl_colpass(field, n2, n1, direction="dit",
                                            inverse_tw=True,
                                            transpose_out=True, **kwb)
                    icp1_ = make_gl_colpass(field, n1, n2, direction="dit",
                                            inverse_tw=True, wmat=iwmat_scaled,
                                            twiddle_pos="pre", **kwb)
                return cp1_, cp2_, icp2_, icp1_

            cp1, cp2, icp2, icp1 = _mk_passes_gl()

            def fwd_core(h, l):
                h, l = cp1(h.reshape(n1, n2), l.reshape(n1, n2))
                h, l = cp2(h, l)
                return h.reshape(n), l.reshape(n)

            def inv_core(h, l):
                h, l = icp2(h.reshape(n2, n1), l.reshape(n2, n1))
                h, l = icp1(h, l)
                return h.reshape(n), l.reshape(n)

            # Unbatched matrix-form twins (Plan.fwd_mat contract): the
            # same kernels with no flat boundary reshape — GL pays the
            # retile twice per boundary, once per limb plane.
            _jgl_mul1 = jax.jit(M.gl_mul)

            def fwd_mat_core(h, l):
                return cp2(*cp1(h, l))

            def inv_mat_core(h, l):
                return icp1(*icp2(h, l))

            def polymul_mat_core(ah, al, bh, bl):
                fah, fal = fwd_mat_core(ah, al)
                fbh, fbl = fwd_mat_core(bh, bl)
                return inv_mat_core(*_jgl_mul1(fah, fal, fbh, fbl))

            def make_batched_cores(B):
                """Dedicated batch-grid kernels (shared tables fetched once
                per lane-slab, like the 32-bit plan's batched path). Also
                returns the matrix-form cores (no flat<->2D boundary
                retile; see plan.py's batched_builder comment — the retile
                costs ~30% of the chained flat pipeline on TPU, and GL
                pays it twice, once per limb plane)."""
                cp1b, cp2b, icp2b, icp1b = _mk_passes_gl(B)
                bsh = (n1, n2) if B == 1 else (B, n1, n2)
                ish = (n2, n1) if B == 1 else (B, n2, n1)

                def fwd2d_b(h, l):
                    h, l = cp1b(h.reshape(bsh), l.reshape(bsh))
                    return cp2b(h, l)

                def inv2d_b(h, l):
                    h, l = icp2b(h.reshape(ish), l.reshape(ish))
                    return icp1b(h, l)

                def fwd_b(h, l):
                    h, l = fwd2d_b(h, l)
                    return h.reshape(B, n), l.reshape(B, n)

                def inv_b(h, l):
                    h, l = inv2d_b(h, l)
                    return h.reshape(B, n), l.reshape(B, n)

                return fwd_b, inv_b, fwd2d_b, inv2d_b

        else:
            col1 = gl_col_transform(field, n1, direction="dif")
            col2 = gl_col_transform(field, n2, direction="dif")
            icol1 = gl_col_transform(field, n1, direction="dit",
                                     inverse=True)
            icol2 = gl_col_transform(field, n2, direction="dit",
                                     inverse=True)
            wmat_dev = _dev_limbs(wmat)
            iwmat_dev = _dev_limbs(iwmat_scaled)

            def fwd_core(h, l):
                h, l = col1(h.reshape(n1, n2), l.reshape(n1, n2))
                h, l = M.gl_mul(h, l, *wmat_dev)
                h, l = h.T, l.T
                h, l = col2(h, l)
                return h.reshape(n), l.reshape(n)

            def inv_core(h, l):
                h, l = icol2(h.reshape(n2, n1), l.reshape(n2, n1))
                h, l = h.T, l.T
                h, l = M.gl_mul(h, l, *iwmat_dev)
                h, l = icol1(h, l)
                return h.reshape(n), l.reshape(n)

    else:  # flat path (small n)
        n_inv = field.inv(n)
        pos = tw.bit_reverse_indices(n).astype(np.int32)
        tw1 = _pack_dev(field, n1, direction="dif")
        itw1 = _pack_dev(field, n1, direction="dit", inverse=True)
        sh, sl = _dev_limbs(np.full(1, n_inv, dtype=object))

        def fwd_core(h, l):
            h, l = gl_dif_stages(h.reshape(n, 1), l.reshape(n, 1), *tw1)
            return h.reshape(n), l.reshape(n)

        def inv_core(h, l):
            h, l = gl_dit_stages(h.reshape(n, 1), l.reshape(n, 1), *itw1)
            h, l = M.gl_mul(h, l, sh.reshape(1, 1), sl.reshape(1, 1))
            return h.reshape(n), l.reshape(n)

        def make_batched_cores(B):
            """Batch-to-lanes: (B, n) limb batches transpose to (n, B) so
            the batch rides the 128-lane axis through the stage loops
            (mirrors plan.py's flat batched layout). No matrix-form cores:
            the flat split has no 2D boundary to skip."""

            def fwd_b(h, l):
                oh, ol = gl_dif_stages(h.reshape(B, n).T, l.reshape(B, n).T,
                                       *tw1)
                return oh.T, ol.T

            def inv_b(h, l):
                oh, ol = gl_dit_stages(h.reshape(B, n).T, l.reshape(B, n).T,
                                       *itw1)
                oh, ol = M.gl_mul(oh, ol, sh.reshape(1, 1), sl.reshape(1, 1))
                return oh.T, ol.T

            return jax.jit(fwd_b), jax.jit(inv_b), None, None

    # _fwd/_inv bind the spectral-order callables now, before the natural-
    # ordering wrappers rebind fwd_core/inv_core below (pointwise products
    # are order-agnostic; see plan.py polymul_fn).
    def polymul_core(ah, al, bh, bl, _fwd=fwd_core, _inv=inv_core):
        fah, fal = _fwd(ah, al)
        fbh, fbl = _fwd(bh, bl)
        ch, cl = M.gl_mul(fah, fal, fbh, fbl)
        return _inv(ch, cl)

    spectral_to_natural = pos
    raw_cores = (fwd_core, inv_core)  # spectral-order, for the batched path

    if config.ordering == "natural":
        perm = jnp.asarray(pos)
        inv_perm_np = np.empty(n, dtype=np.int32)
        inv_perm_np[pos] = np.arange(n, dtype=np.int32)
        inv_perm = jnp.asarray(inv_perm_np)
        raw_fwd, raw_inv = fwd_core, inv_core

        def fwd_core(h, l):  # noqa: F811
            h, l = raw_fwd(h, l)
            return jnp.take(h, perm), jnp.take(l, perm)

        def inv_core(h, l):  # noqa: F811
            return raw_inv(jnp.take(h, inv_perm), jnp.take(l, inv_perm))

    nega_core = None
    if config.negacyclic:
        psi = _dev_limbs(tw.negacyclic_psi_powers(field, n))
        psi_inv = _dev_limbs(tw.negacyclic_psi_powers(field, n, inverse=True))

        def nega_core(ah, al, bh, bl):
            tah, tal = M.gl_mul(ah, al, *psi)
            tbh, tbl = M.gl_mul(bh, bl, *psi)
            ch, cl = polymul_core(tah, tal, tbh, tbl)
            return M.gl_mul(ch, cl, *psi_inv)

    jfwd = jax.jit(lambda hl: fwd_core(*hl))
    jinv = jax.jit(lambda hl: inv_core(*hl))
    jmul = jax.jit(lambda a, b: polymul_core(*a, *b))
    jnega = jax.jit(lambda a, b: nega_core(*a, *b)) if nega_core else None

    def _in(x):
        """Accept a (hi, lo) tuple or a uint64-convertible host array."""
        if isinstance(x, tuple):
            return x, False
        return M.gl_from_u64(np.asarray(x, dtype=np.uint64)), True

    def _out(hl, as_u64):
        return M.gl_to_u64(*hl) if as_u64 else hl

    def _wrap1(fn):
        def call(a):
            hl, u64 = _in(a)
            return _out(fn(hl), u64)

        return call

    def _wrap2(fn):
        def call(a, b):
            ahl, u64a = _in(a)
            bhl, _ = _in(b)
            return _out(fn(ahl, bhl), u64a)

        return call

    def batched_builder(B):
        fwd2d_b = inv2d_b = None
        if make_batched_cores is not None:
            bfwd_core, binv_core, fwd2d_b, inv2d_b = make_batched_cores(B)

            # gl_mul is ~70 elementwise lane-ops: dispatched eagerly
            # between the compiled passes it costs ~70 tunnel round trips
            # per call (the plan.py _pointwise lesson); jit it.
            jgl_mul = jax.jit(M.gl_mul)

            if fwd2d_b is not None:
                # stay in matrix form through the pointwise product — the
                # flat roundtrips between passes are pure retile churn
                def bmul2d_core(ah, al, bh, bl):
                    fah, fal = fwd2d_b(ah, al)
                    fbh, fbl = fwd2d_b(bh, bl)
                    ch, cl = jgl_mul(fah, fal, fbh, fbl)
                    return inv2d_b(ch, cl)

                def bmul_core(ah, al, bh, bl):
                    h, l = bmul2d_core(ah, al, bh, bl)
                    return h.reshape(B, n), l.reshape(B, n)
            else:
                def bmul_core(ah, al, bh, bl):
                    fah, fal = bfwd_core(ah, al)
                    fbh, fbl = bfwd_core(bh, bl)
                    ch, cl = jgl_mul(fah, fal, fbh, fbl)
                    return binv_core(ch, cl)

            bfwd, binv, bmul = bfwd_core, binv_core, bmul_core
        else:
            # raw (spectral-order) cores: the vmap must NOT pick up the
            # natural-ordering rebinding of fwd_core/inv_core below
            bfwd = jax.jit(jax.vmap(raw_cores[0]))
            binv = jax.jit(jax.vmap(raw_cores[1]))
            bmul = jax.jit(jax.vmap(polymul_core))
        if config.ordering == "natural":
            # honor the ordering wrapper exactly like the unbatched
            # callables (perm/inv_perm bound below, before any call)
            raw_bfwd, raw_binv = bfwd, binv

            def bfwd(h, l):  # noqa: F811
                h, l = raw_bfwd(h, l)
                return jnp.take(h, perm, axis=1), jnp.take(l, perm, axis=1)

            def binv(h, l):  # noqa: F811
                return raw_binv(jnp.take(h, inv_perm, axis=1),
                                jnp.take(l, inv_perm, axis=1))

        out = {
            "fwd": _wrap1(lambda hl: bfwd(*hl)),
            "inv": _wrap1(lambda hl: binv(*hl)),
            "polymul": _wrap2(lambda a, b: bmul(*a, *b)),
        }
        if config.negacyclic and nega_core is not None:
            # batched negacyclic (round 5: parity with plan.py's batched
            # dicts): psi limb vectors broadcast over the batch; the psi
            # multiplies are jitted (the _pointwise lesson)
            if make_batched_cores is not None:
                def bnega_core(ah, al, bh, bl):
                    tah, tal = jgl_mul(ah, al, *psi)
                    tbh, tbl = jgl_mul(bh, bl, *psi)
                    ch, cl = bmul(tah, tal, tbh, tbl)
                    return jgl_mul(ch, cl, *psi_inv)

                out["negacyclic_polymul"] = _wrap2(
                    lambda a, b: bnega_core(*a, *b))
                if fwd2d_b is not None:
                    psi_m = tuple(v.reshape(n1, n2) for v in psi)
                    psi_im = tuple(v.reshape(n1, n2) for v in psi_inv)

                    def bnega2d_core(ah, al, bh, bl):
                        tah, tal = jgl_mul(ah, al, *psi_m)
                        tbh, tbl = jgl_mul(bh, bl, *psi_m)
                        ch, cl = bmul2d_core(tah, tal, tbh, tbl)
                        return jgl_mul(ch, cl, *psi_im)

                    out["negacyclic_polymul_mat"] = _wrap2(
                        lambda a, b: bnega2d_core(*a, *b))
            else:
                bnega_v = jax.jit(jax.vmap(nega_core))
                out["negacyclic_polymul"] = _wrap2(
                    lambda a, b: bnega_v(*a, *b))
        if fwd2d_b is not None:
            # matrix-form callables (plan.py contract: fwd_mat (B, n1, n2)
            # natural-layout -> (B, n2, n1) spectral, inv_mat converse,
            # polymul_mat layout-safe), over uint64 or (hi, lo) operands
            out["polymul_mat"] = _wrap2(lambda a, b: tuple(
                z.reshape(B, n1, n2) for z in bmul2d_core(*a, *b)))
            if config.ordering == "bitrev":
                out["fwd_mat"] = _wrap1(lambda hl: tuple(
                    z.reshape(B, n2, n1) for z in fwd2d_b(*hl)))
                out["inv_mat"] = _wrap1(lambda hl: tuple(
                    z.reshape(B, n1, n2) for z in inv2d_b(*hl)))
        return out

    mat_kw = {}
    if fwd_mat_core is not None:
        mat_kw["polymul_mat"] = _wrap2(
            lambda a, b: polymul_mat_core(*a, *b))
        if config.ordering == "bitrev":
            mat_kw["fwd_mat"] = _wrap1(lambda hl: fwd_mat_core(*hl))
            mat_kw["inv_mat"] = _wrap1(lambda hl: inv_mat_core(*hl))
        if config.negacyclic:
            psi_m1 = tuple(v.reshape(n1, n2) for v in psi)
            psi_im1 = tuple(v.reshape(n1, n2) for v in psi_inv)

            def nega_mat_core(ah, al, bh, bl):
                tah, tal = _jgl_mul1(ah, al, *psi_m1)
                tbh, tbl = _jgl_mul1(bh, bl, *psi_m1)
                ch, cl = polymul_mat_core(tah, tal, tbh, tbl)
                return _jgl_mul1(ch, cl, *psi_im1)

            mat_kw["negacyclic_polymul_mat"] = _wrap2(
                lambda a, b: nega_mat_core(*a, *b))

    return Plan(
        config=config,
        fwd=_wrap1(jfwd),
        inv=_wrap1(jinv),
        polymul=_wrap2(jmul),
        negacyclic_polymul=_wrap2(jnega) if jnega else None,
        spectral_to_natural=spectral_to_natural,
        engine=engine if n2 > 1 else "xla",  # flat path has no pallas kernels
        reduction="goldilocks",
        wmat_factored=wfac_on,
        wmat_fold=fold_on,
        _batched_builder=batched_builder,
        **mat_kw,
    )
