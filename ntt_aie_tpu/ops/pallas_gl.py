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
    twiddle_pos: str = "none",  # 'none' | 'pre' | 'post'
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
):
    """pallas_call fn(xh, xl, *stage_tw_limbs, *[wmat limbs]) -> (yh, yl)
    over (n1, block_lanes) VMEM slabs, gridded over n2 // block_lanes
    (x batch). Stage twiddles: per stage a (t,1) hi and lo array; wmat:
    (n1, n2) hi and lo. mul_impl selects the limb product: 4-partial
    schoolbook (gl_mul) or 3-partial Karatsuba (gl_mul_kara) — bit-exact
    either way, measured per hardware (DESIGN.md §5)."""
    logn = n1.bit_length() - 1
    ts = _stage_shapes(n1, direction)
    gmul = M.gl_mul if mul_impl == "schoolbook" else M.gl_mul_kara
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

    def kernel(*refs):
        xh_ref, xl_ref = refs[0], refs[1]
        tw_refs = refs[2 : 2 + 2 * logn]
        idx = 2 + 2 * logn
        wmat_refs = refs[idx : idx + n_wm1]
        wmat2_refs = refs[idx + n_wm1 : idx + n_wm1 + n_wm2]
        oh_ref, ol_ref = refs[-2], refs[-1]

        def _mul_mat(h, l, wrefs):
            wh = wrefs[0][:].reshape(h.shape)
            wl = wrefs[1][:].reshape(h.shape)
            return gmul(h, l, wh, wl)

        h = xh_ref[:]
        l = xl_ref[:]
        if batch > 1:
            h = h.reshape(h.shape[-2], h.shape[-1])
            l = l.reshape(l.shape[-2], l.shape[-1])
        if twiddle_pos == "pre":
            h, l = _mul_mat(h, l, wmat_refs)
        if twiddle_pos2 == "pre":
            h, l = _mul_mat(h, l, wmat2_refs)
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
            FUSE = 3
        else:
            FUSE = 7 if dit_net == "parts" else 1
        s = 0
        while s < logn:
            k = min(FUSE, logn - s)
            radix = 1 << k
            vecs = [(tw_refs[2 * (s + j)][:], tw_refs[2 * (s + j) + 1][:])
                    for j in range(k)]
            if direction == "dif":
                tl = ts[s + k - 1]
            else:
                tl = ts[s]
            blocks = n1 // (radix * tl)
            hr = h.reshape(blocks, radix, tl, c)
            lr = l.reshape(blocks, radix, tl, c)
            if direction == "dif":
                net = net_dif
            else:
                net = net_dit_parts if dit_net == "parts" else net_dit
            parts = net(hr, lr, vecs, tl)
            h = jnp.concatenate([ph for ph, _ in parts], axis=1).reshape(n1, c)
            l = jnp.concatenate([pl_ for _, pl_ in parts], axis=1).reshape(n1, c)
            s += k
        if twiddle_pos == "post":
            h, l = _mul_mat(h, l, wmat_refs)
        if twiddle_pos2 == "post":
            h, l = _mul_mat(h, l, wmat2_refs)
        if transpose_out:
            h = h.T
            l = l.T
        oh_ref[:] = h.reshape(oh_ref.shape)
        ol_ref[:] = l.reshape(ol_ref.shape)

    if batch == 1:
        x_spec = pl.BlockSpec((n1, block_lanes), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
        wmat_spec = x_spec
        tw_specs = [
            pl.BlockSpec((t, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
            for t in ts for _ in range(2)
        ]
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
        tw_specs = [
            pl.BlockSpec((t, 1), lambda i, b: (0, 0), memory_space=pltpu.VMEM)
            for t in ts for _ in range(2)
        ]
        if transpose_out:
            out_spec = pl.BlockSpec((1, block_lanes, n1), lambda i, b: (b, i, 0),
                                    memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((batch, n2, n1), jnp.uint32)
        else:
            out_spec = x_spec
            out_shape = jax.ShapeDtypeStruct((batch, n1, n2), jnp.uint32)
        full_grid = (grid, batch)

    in_specs = [x_spec, x_spec] + tw_specs
    in_specs.extend([wmat_spec, wmat_spec] * ((n_wm1 + n_wm2) // 2))

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

    def __init__(self, fn, tw_limbs: list, wmat_limbs: tuple | None):
        self.fn = fn
        self.tw = [jnp.asarray(t) for t in tw_limbs]
        self.wmat = (
            tuple(jnp.asarray(w) for w in wmat_limbs) if wmat_limbs else None
        )

    def __call__(self, h, l):
        args = [h, l] + self.tw
        if self.wmat is not None:
            args.extend(self.wmat)
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
) -> GLColpass:
    from ntt_aie_tpu import twiddles as tw
    from ntt_aie_tpu.goldilocks_plan import _split_limbs

    if direction == "dif":
        vecs = tw.dif_stage_twiddles(field, n1, inverse=inverse_tw)
    else:
        vecs = tw.dit_stage_twiddles(field, n1, inverse=inverse_tw)
    tw_limbs: list[np.ndarray] = []
    for v in vecs:
        hi, lo = _split_limbs(v.reshape(-1, 1))
        tw_limbs.extend([hi, lo])
    wmat_limbs = _split_limbs(wmat) if wmat is not None else None
    if wmat2 is not None:
        w2 = _split_limbs(wmat2)
        wmat_limbs = (tuple(wmat_limbs) if wmat_limbs else ()) + tuple(w2)
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
    )
    return GLColpass(fn, tw_limbs, wmat_limbs)
