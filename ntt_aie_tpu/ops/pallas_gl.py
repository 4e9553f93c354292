"""Fused Pallas column-pass NTT kernels for Goldilocks (p = 2^64 - 2^32 + 1).

Same kernel shape as ops/pallas_ntt.py (all butterfly stages of one
four-step pass fused into a single kernel, HBM read/written once per pass,
optional fused transpose and four-step twiddle multiply) but every value is
a (hi, lo) uint32 limb pair and butterflies run the gl_* limb arithmetic
(ops/modops.py): 4-partial-product 128-bit multiply reduced via
2^64 ≡ 2^32 - 1, 2^96 ≡ -1. This is the 64-bit analog of the reference's
acc64 emulation requirement (SURVEY.md §7 hard part 1).

Values stay canonical [0, p) at every step (gl_add/gl_sub/gl_mul fold), so
there is no lazy-domain bookkeeping and no epilogue canonicalization.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ntt_aie_tpu.ops import modops as M


def _stage_shapes(n1: int, direction: str) -> list[int]:
    logn = n1.bit_length() - 1
    if direction == "dif":
        return [n1 >> (s + 1) for s in range(logn)]
    return [1 << s for s in range(logn)]


def build_gl_colpass(
    *,
    n1: int,
    n2: int,
    direction: str,  # 'dif' | 'dit'
    twiddle_pos: str = "none",  # 'none' | 'pre' | 'post' | 'post_t'
    # ('post_t' = after the fused output transpose, operand in the
    # transposed (n2, n1) orientation blocked like the output — the
    # wmat_fold position, mirrors ops/pallas_ntt round 5; requires
    # transpose_out=True)
    twiddle_pos2: str = "none",  # optional SECOND matrix multiply (e.g. a
    # 'pre' negacyclic psi alongside a 'post' four-step wmat) — mirrors
    # ops/pallas_ntt.build_colpass's twiddle_pos2
    block_lanes: int | None = None,
    batch: int = 1,
    transpose_out: bool = False,
    interpret: bool = False,
    fuse: int | None = None,
    dit_net: str = "parts",  # 'parts' (leaf-part DIT, zero internal
    # concats — default) | 'tree' (round-2 recursion); bit-identical
    mul_impl: str = "schoolbook",  # 'schoolbook' (gl_mul) | 'karatsuba'
    wfac_pos: str = "none",  # 'none' | 'pre' | 'post': FACTORED four-step
    # twiddle multiply on limb pairs (twiddles.fourstep_wfac_T rows split
    # c = c1*S + c0): two chained gl_muls against (n1/S + S) x lanes limb
    # tables instead of one n1 x lanes limb-pair matrix — the GL analog
    # of ops/pallas_ntt's wfac_pos (round 4; GL is where full matrices
    # hurt most: two limb planes per operand).
    wfac_split: int = 0,  # S; required when wfac_pos != 'none'
    rank1_pos: str = "none",  # 'none' | 'pre' | 'post': rank-1 multiply
    # row_factor[r] * col_factor[c] limb pairs (negacyclic psi) — 1-D
    # operands instead of an n1 x n2 limb-pair matrix.
    phases_ts: tuple | None = None,  # nested column network
    # (twiddles.col_network): per-phase explicit half-block-size lists;
    # two phases add a mid step (DIF: wmid limb multiply then the
    # (R, S) -> (S, R) row transpose; DIT: the mirror). None = one
    # standard full-depth phase.
    mid_rs: tuple = (0, 0),
):
    """pallas_call fn(xh, xl, *stage_tw_limbs, *[wmat limbs], *[wfac
    limbs], *[rank1 limbs]) -> (yh, yl) over (n1, block_lanes) VMEM
    slabs, gridded over n2 // block_lanes (x batch). Stage twiddles: per
    stage a (t,1) hi and lo array; wmat: (n1, n2) hi and lo; wfac: T1
    (n1/S, n2) + T2 (S, n2) hi/lo; rank1: (n1,1) + (1,n2) hi/lo.
    mul_impl selects the limb product: 4-partial schoolbook (gl_mul) or
    3-partial Karatsuba (gl_mul_kara) — bit-exact either way, measured
    per hardware (DESIGN.md §5)."""
    if phases_ts is None:
        phases_ts = (_stage_shapes(n1, direction),)
    ts = [t for ph in phases_ts for t in ph]
    logn = len(ts)
    assert logn == n1.bit_length() - 1
    nested = len(phases_ts) == 2
    R_mid, S_mid = mid_rs
    has_post_t = "post_t" in (twiddle_pos, twiddle_pos2)
    if has_post_t and not transpose_out:
        raise ValueError("twiddle_pos 'post_t' multiplies the transposed "
                         "output tile; it requires transpose_out=True")
    gmul = M.gl_mul if mul_impl == "schoolbook" else M.gl_mul_kara
    S = wfac_split
    if wfac_pos != "none" and not (0 < S < n1 and n1 % S == 0):
        raise ValueError(
            f"wfac_split {S} must be a proper divisor of rows n1={n1}")
    if block_lanes is None:
        # 512 lanes beats 256 by ~13% at n1=1024 on v5e (measured round 2:
        # 379 vs 436 us/pass, B=64) — the two limb planes double live
        # temporaries but still fit scoped VMEM at this width; 128 lanes
        # is ~60% slower, 1024 untested territory left to callers.
        # Round 3 moved tall columns to the same 1 MB-slab target as the
        # 32-bit kernel: at n1=2048 (n=2^22 four-step) 512 lanes measured
        # 13115 vs 13941 us/pass at 256 (B=4, −6%). Passes carrying a
        # full wmat multiply keep the 512 KB target: their two extra
        # n1-tall limb slabs put 512-lane slabs at n1=2048 5% over the
        # 100 MB scoped-VMEM limit (measured compile OOM, 105.45 MB).
        target = (1 << 19) if twiddle_pos != "none" or twiddle_pos2 != "none" \
            else (1 << 20)
        block_lanes = max(128, min(512, target // max(n1, 1)))
    block_lanes = min(block_lanes, n2)
    assert n2 % block_lanes == 0
    grid = n2 // block_lanes

    n_wm1 = 2 if twiddle_pos != "none" else 0
    n_wm2 = 2 if twiddle_pos2 != "none" else 0
    n_wf = 4 if wfac_pos != "none" else 0
    n_r1 = 4 if rank1_pos != "none" else 0
    n_mid = 2 if nested else 0

    def kernel(*refs):
        xh_ref, xl_ref = refs[0], refs[1]
        tw_refs = refs[2 : 2 + 2 * logn]
        mid_refs = refs[2 + 2 * logn : 2 + 2 * logn + n_mid]
        idx = 2 + 2 * logn + n_mid
        wmat_refs = refs[idx : idx + n_wm1]
        wmat2_refs = refs[idx + n_wm1 : idx + n_wm1 + n_wm2]
        wfac_refs = refs[idx + n_wm1 + n_wm2 : idx + n_wm1 + n_wm2 + n_wf]
        r1_refs = refs[idx + n_wm1 + n_wm2 + n_wf :
                       idx + n_wm1 + n_wm2 + n_wf + n_r1]
        oh_ref, ol_ref = refs[-2], refs[-1]

        def _mul_mat(h, l, wrefs):
            wh = wrefs[0][:].reshape(h.shape)
            wl = wrefs[1][:].reshape(h.shape)
            return gmul(h, l, wh, wl)

        def _apply_wfac(h, l):
            # rows are the linear exponent axis c = c1*S + c0: gl_mul by
            # T1[c1] broadcast over c0, then T2[c0] broadcast over c1
            rr, cc = h.shape
            hr, lr = h.reshape(rr // S, S, cc), l.reshape(rr // S, S, cc)
            hr, lr = gmul(hr, lr,
                          wfac_refs[0][:].reshape(rr // S, 1, cc),
                          wfac_refs[1][:].reshape(rr // S, 1, cc))
            hr, lr = gmul(hr, lr,
                          wfac_refs[2][:].reshape(1, S, cc),
                          wfac_refs[3][:].reshape(1, S, cc))
            return hr.reshape(rr, cc), lr.reshape(rr, cc)

        def _apply_rank1(h, l):
            rr, cc = h.shape
            h, l = gmul(h, l, r1_refs[0][:].reshape(rr, 1),
                        r1_refs[1][:].reshape(rr, 1))
            return gmul(h, l, r1_refs[2][:].reshape(1, cc),
                        r1_refs[3][:].reshape(1, cc))

        h = xh_ref[:]
        l = xl_ref[:]
        if batch > 1:
            h = h.reshape(h.shape[-2], h.shape[-1])
            l = l.reshape(l.shape[-2], l.shape[-1])
        if twiddle_pos == "pre":
            h, l = _mul_mat(h, l, wmat_refs)
        if twiddle_pos2 == "pre":
            h, l = _mul_mat(h, l, wmat2_refs)
        if wfac_pos == "pre":
            h, l = _apply_wfac(h, l)
        if rank1_pos == "pre":
            h, l = _apply_rank1(h, l)
        c = h.shape[1]

        # Fused radix-2^K stage groups (same recursion as the 32-bit kernel,
        # ops/pallas_ntt.py): one full-size concat per K stages instead of
        # one stack per stage. Values stay canonical (gl_* ops fold).
        def net_dif(ah, al, vecs, tl):
            r = ah.shape[1]
            if r == 1:
                return [(ah, al)]
            half = r // 2
            uh, ul = ah[:, :half], al[:, :half]
            vh, vl = ah[:, half:], al[:, half:]
            wh = vecs[0][0].reshape(1, half, tl, 1)
            wl = vecs[0][1].reshape(1, half, tl, 1)
            sh, sl = M.gl_add(uh, ul, vh, vl)
            dh, dl = M.gl_sub(uh, ul, vh, vl)
            mh, ml = gmul(dh, dl, wh, wl)
            return net_dif(sh, sl, vecs[1:], tl) + net_dif(mh, ml, vecs[1:], tl)

        def net_dit(ah, al, vecs, tl):
            # Whole-half vectorized like net_dif (see ops/pallas_ntt.py
            # net_dit): the leaf-ordered twiddle vector reshaped to
            # (half, tl) covers every leaf in one gmul/add/sub, replacing
            # the per-leaf small-op loop. Bit-identical values.
            r = ah.shape[1]
            if r == 1:
                return [(ah, al)]
            half = r // 2
            u_parts = net_dit(ah[:, :half], al[:, :half], vecs[:-1], tl)
            v_parts = net_dit(ah[:, half:], al[:, half:], vecs[:-1], tl)

            def cat(parts, j):
                return (parts[0][j] if len(parts) == 1 else
                        jnp.concatenate([p[j] for p in parts], axis=1))

            uh, ul = cat(u_parts, 0), cat(u_parts, 1)
            vh, vl = cat(v_parts, 0), cat(v_parts, 1)
            wh = vecs[-1][0].reshape(1, half, tl, 1)
            wl = vecs[-1][1].reshape(1, half, tl, 1)
            wvh, wvl = gmul(vh, vl, wh, wl)
            return [M.gl_add(uh, ul, wvh, wvl), M.gl_sub(uh, ul, wvh, wvl)]

        def net_dit_parts(ah, al, vecs, tl):
            # Leaf-part DIT (the 32-bit kernel's round-3 'parts' net at 64
            # bits): zero internal concats, per-leaf twiddle slices. GL
            # values stay canonical so there is no lazy-subtree variant.
            r = ah.shape[1]
            if r == 1:
                return [(ah, al)]
            half = r // 2
            u_parts = net_dit_parts(ah[:, :half], al[:, :half], vecs[:-1], tl)
            v_parts = net_dit_parts(ah[:, half:], al[:, half:], vecs[:-1], tl)
            wh = vecs[-1][0].reshape(half, tl)
            wl = vecs[-1][1].reshape(half, tl)
            adds, subs = [], []
            for i, ((uh, ul), (vh, vl)) in enumerate(zip(u_parts, v_parts)):
                mh, ml = gmul(vh, vl, wh[i].reshape(1, 1, tl, 1),
                              wl[i].reshape(1, 1, tl, 1))
                adds.append(M.gl_add(uh, ul, mh, ml))
                subs.append(M.gl_sub(uh, ul, mh, ml))
            return adds + subs

        # Per-direction measured defaults (v5e, B=16, n1=1024, us/pass —
        # scripts/scan_gl_nets.py, round 3): DIF f1 11205 / f3 10824
        # (take 3); DIT tree was flat ~17.2-17.4ms at any fuse, but the
        # parts net keeps improving with depth — f5 14145, f6 12899,
        # f7 11963 (take 7; -31% vs round-2's tree f1 and within 11% of
        # the DIF pass). Under the interpreter deep fuse is ~10x slower
        # (per-leaf op explosion), so interpret keeps f1 — fuse is a
        # pure perf knob, outputs are bit-identical (tested).
        if fuse is not None:
            FUSE = fuse
        elif interpret:
            FUSE = 1
        elif direction == "dif":
            # nested full-occupancy phases: f2 ~= f5 < f1 < f3 (round-4
            # rescan, scan_nested_fuse.py — the old f3 default is the
            # WORST choice under nesting); plain columns keep f3.
            FUSE = 2 if nested else 3
        else:
            FUSE = 7 if dit_net == "parts" else 1

        def run_phase(h, l, ph_ts, s0):
            # fused radix-2^K groups over the stages of ONE phase (groups
            # never straddle the nested mid step)
            s = 0
            kph = len(ph_ts)
            while s < kph:
                k = min(FUSE, kph - s)
                radix = 1 << k
                vecs = [(tw_refs[2 * (s0 + s + j)][:],
                         tw_refs[2 * (s0 + s + j) + 1][:])
                        for j in range(k)]
                if direction == "dif":
                    tl = ph_ts[s + k - 1]
                else:
                    tl = ph_ts[s]
                blocks = n1 // (radix * tl)
                hr = h.reshape(blocks, radix, tl, c)
                lr = l.reshape(blocks, radix, tl, c)
                if direction == "dif":
                    net = net_dif
                else:
                    net = net_dit_parts if dit_net == "parts" else net_dit
                parts = net(hr, lr, vecs, tl)
                h = jnp.concatenate([p_ for p_, _ in parts],
                                    axis=1).reshape(n1, c)
                l = jnp.concatenate([p_ for _, p_ in parts],
                                    axis=1).reshape(n1, c)
                s += k
            return h, l

        h, l = run_phase(h, l, list(phases_ts[0]), 0)
        if nested:
            wmh = mid_refs[0][:].reshape(n1, 1)
            wml = mid_refs[1][:].reshape(n1, 1)
            if direction == "dif":
                h, l = gmul(h, l, wmh, wml)
                h = h.reshape(R_mid, S_mid, c).swapaxes(0, 1).reshape(n1, c)
                l = l.reshape(R_mid, S_mid, c).swapaxes(0, 1).reshape(n1, c)
            else:
                h = h.reshape(S_mid, R_mid, c).swapaxes(0, 1).reshape(n1, c)
                l = l.reshape(S_mid, R_mid, c).swapaxes(0, 1).reshape(n1, c)
                h, l = gmul(h, l, wmh, wml)
            h, l = run_phase(h, l, list(phases_ts[1]), len(phases_ts[0]))
        if twiddle_pos == "post":
            h, l = _mul_mat(h, l, wmat_refs)
        if twiddle_pos2 == "post":
            h, l = _mul_mat(h, l, wmat2_refs)
        if wfac_pos == "post":
            h, l = _apply_wfac(h, l)
        if rank1_pos == "post":
            h, l = _apply_rank1(h, l)
        if transpose_out:
            h = h.T
            l = l.T
        # post_t: multiply the already-transposed tile (operands arrive
        # output-blocked) — the wmat_fold position
        if twiddle_pos == "post_t":
            h, l = _mul_mat(h, l, wmat_refs)
        if twiddle_pos2 == "post_t":
            h, l = _mul_mat(h, l, wmat2_refs)
        oh_ref[:] = h.reshape(oh_ref.shape)
        ol_ref[:] = l.reshape(ol_ref.shape)

    if batch == 1:
        x_spec = pl.BlockSpec((n1, block_lanes), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
        wmat_spec = x_spec
        wmat_t_spec = pl.BlockSpec((block_lanes, n1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
        tw_specs = [
            pl.BlockSpec((t, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
            for t in ts for _ in range(2)
        ]
        tw_specs += [pl.BlockSpec((n1, 1), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)] * n_mid
        wfac_specs = ([pl.BlockSpec((n1 // S, block_lanes), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)] * 2
                      + [pl.BlockSpec((S, block_lanes), lambda i: (0, i),
                                      memory_space=pltpu.VMEM)] * 2
                      ) if n_wf else []
        rank1_specs = ([pl.BlockSpec((n1, 1), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)] * 2
                       + [pl.BlockSpec((1, block_lanes), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)] * 2
                       ) if n_r1 else []
        if transpose_out:
            out_spec = pl.BlockSpec((block_lanes, n1), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((n2, n1), jnp.uint32)
        else:
            out_spec = x_spec
            out_shape = jax.ShapeDtypeStruct((n1, n2), jnp.uint32)
        full_grid = (grid,)
    else:
        x_spec = pl.BlockSpec((1, n1, block_lanes), lambda i, b: (b, 0, i),
                              memory_space=pltpu.VMEM)
        wmat_spec = pl.BlockSpec((n1, block_lanes), lambda i, b: (0, i),
                                 memory_space=pltpu.VMEM)
        wmat_t_spec = pl.BlockSpec((block_lanes, n1), lambda i, b: (i, 0),
                                   memory_space=pltpu.VMEM)
        tw_specs = [
            pl.BlockSpec((t, 1), lambda i, b: (0, 0), memory_space=pltpu.VMEM)
            for t in ts for _ in range(2)
        ]
        tw_specs += [pl.BlockSpec((n1, 1), lambda i, b: (0, 0),
                                  memory_space=pltpu.VMEM)] * n_mid
        wfac_specs = ([pl.BlockSpec((n1 // S, block_lanes),
                                    lambda i, b: (0, i),
                                    memory_space=pltpu.VMEM)] * 2
                      + [pl.BlockSpec((S, block_lanes), lambda i, b: (0, i),
                                      memory_space=pltpu.VMEM)] * 2
                      ) if n_wf else []
        rank1_specs = ([pl.BlockSpec((n1, 1), lambda i, b: (0, 0),
                                     memory_space=pltpu.VMEM)] * 2
                       + [pl.BlockSpec((1, block_lanes), lambda i, b: (0, i),
                                       memory_space=pltpu.VMEM)] * 2
                       ) if n_r1 else []
        if transpose_out:
            out_spec = pl.BlockSpec((1, block_lanes, n1), lambda i, b: (b, i, 0),
                                    memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((batch, n2, n1), jnp.uint32)
        else:
            out_spec = x_spec
            out_shape = jax.ShapeDtypeStruct((batch, n1, n2), jnp.uint32)
        full_grid = (grid, batch)

    in_specs = [x_spec, x_spec] + tw_specs
    wm1_spec = wmat_t_spec if twiddle_pos == "post_t" else wmat_spec
    wm2_spec = wmat_t_spec if twiddle_pos2 == "post_t" else wmat_spec
    in_specs.extend([wm1_spec, wm1_spec] * (n_wm1 // 2))
    in_specs.extend([wm2_spec, wm2_spec] * (n_wm2 // 2))
    in_specs.extend(wfac_specs)
    in_specs.extend(rank1_specs)

    return pl.pallas_call(
        kernel,
        grid=full_grid,
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(out_shape, out_shape),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )


class GLColpass:
    """Bundles the pallas_call with its prepared limb twiddle operands."""

    def __init__(self, fn, tw_limbs: list, wmat_limbs: tuple | None,
                 wfac_limbs: tuple | None = None,
                 rank1_limbs: tuple | None = None):
        self.fn = fn
        self.tw = [jnp.asarray(t) for t in tw_limbs]
        self.wmat = (
            tuple(jnp.asarray(w) for w in wmat_limbs) if wmat_limbs else None
        )
        self.wfac = (
            tuple(jnp.asarray(w) for w in wfac_limbs) if wfac_limbs else None
        )
        self.rank1 = (
            tuple(jnp.asarray(w) for w in rank1_limbs) if rank1_limbs
            else None
        )

    def __call__(self, h, l):
        args = [h, l] + self.tw
        if self.wmat is not None:
            args.extend(self.wmat)
        if self.wfac is not None:
            args.extend(self.wfac)
        if self.rank1 is not None:
            args.extend(self.rank1)
        return self.fn(*args)


def make_gl_colpass(
    field,
    n1: int,
    n2: int,
    *,
    direction: str,
    inverse_tw: bool = False,
    wmat: np.ndarray | None = None,
    twiddle_pos: str = "none",
    wmat2: np.ndarray | None = None,
    twiddle_pos2: str = "none",
    interpret: bool = False,
    block_lanes: int | None = None,
    batch: int = 1,
    transpose_out: bool = False,
    fuse: int | None = None,
    dit_net: str = "parts",
    mul_impl: str = "schoolbook",
    wfac: tuple | None = None,   # (T1, T2) from twiddles.fourstep_wfac_T
    wfac_pos: str = "none",
    rank1: tuple | None = None,  # (row, col) from negacyclic_psi_factors
    rank1_pos: str = "none",
) -> GLColpass:
    from ntt_aie_tpu import twiddles as tw
    from ntt_aie_tpu.goldilocks_plan import _split_limbs

    net = tw.col_network(field, n1, direction=direction, inverse=inverse_tw)
    tw_limbs: list[np.ndarray] = []
    for ph in net["phases"]:
        for v in ph["vecs"]:
            hi, lo = _split_limbs(v.reshape(-1, 1))
            tw_limbs.extend([hi, lo])
    if net["mid"] is not None:
        hi, lo = _split_limbs(net["mid"]["wmid"].reshape(-1, 1))
        tw_limbs.extend([hi, lo])
    wmat_limbs = _split_limbs(wmat) if wmat is not None else None
    if wmat2 is not None:
        w2 = _split_limbs(wmat2)
        wmat_limbs = (tuple(wmat_limbs) if wmat_limbs else ()) + tuple(w2)
    wfac_limbs = None
    wfac_split = 0
    if wfac is not None:
        t1, t2 = wfac
        wfac_split = n1 // t1.shape[0]
        wfac_limbs = _split_limbs(t1) + _split_limbs(t2)
    rank1_limbs = None
    if rank1 is not None:
        rvec, cvec = rank1
        rh, rl = _split_limbs(np.reshape(rvec, (n1, 1)))
        ch, cl = _split_limbs(np.reshape(cvec, (1, n2)))
        rank1_limbs = (rh, rl, ch, cl)
    fn = build_gl_colpass(
        n1=n1,
        n2=n2,
        direction=direction,
        twiddle_pos=twiddle_pos,
        twiddle_pos2=twiddle_pos2 if wmat2 is not None else "none",
        interpret=interpret,
        block_lanes=block_lanes,
        batch=batch,
        transpose_out=transpose_out,
        fuse=fuse,
        dit_net=dit_net,
        mul_impl=mul_impl,
        wfac_pos=wfac_pos if wfac is not None else "none",
        wfac_split=wfac_split,
        rank1_pos=rank1_pos if rank1 is not None else "none",
        phases_ts=tuple(tuple(ph["ts"]) for ph in net["phases"]),
        mid_rs=(net["R"], net["S"]),
    )
    return GLColpass(fn, tw_limbs, wmat_limbs, wfac_limbs, rank1_limbs)
