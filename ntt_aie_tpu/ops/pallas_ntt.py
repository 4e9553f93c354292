"""Fused Pallas column-pass NTT kernels.

This is the L1 kernel layer (SURVEY.md §7): the TPU-native replacement for
the reference's per-tile device kernel ``ntt_stage0_to_Nminus5``
(reference src/aie_core.cc:189-361). Differences by design:

- The reference spends stages 0-3 on register shuffles because its strides
  fall below the 16-lane vector width (src/aie_core.cc:211-336). Here the
  data is a (N1, lanes) matrix and *every* stage slices the sublane axis;
  the 128-lane axis is pure SIMD (SURVEY.md §7 hard part 2).
- The reference pipelines HBM<->tile traffic with depth-2 ObjectFIFOs
  (src/aie2.py:28,90-115). Here the Pallas grid pipeline double-buffers
  HBM->VMEM slab fetches automatically.
- All log2(N1) stages and the four-step twiddle multiply are fused into ONE
  kernel invocation per slab: the matrix is read from HBM once and written
  once per pass, vs. once per stage for the unfused XLA path.
- Butterfly multiplies go through a Reduction strategy; the default Harvey
  path costs 6 uint32 muls per butterfly (uint32 mul is the VPU's scarce
  resource), with lazy [0,2p) values canonicalized once in the epilogue.

One kernel shape, four uses: forward column pass (DIF, + post twiddle),
inverse column pass (DIT, + pre twiddle), each over either axis of the
four-step decomposition. Canonicalization fuses into the last pass.
"""

from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ntt_aie_tpu.ops.reductions import Reduction, make_reduction


def _stage_shapes(n1: int, direction: str) -> list[int]:
    logn = n1.bit_length() - 1
    if direction == "dif":
        return [n1 >> (s + 1) for s in range(logn)]
    return [1 << s for s in range(logn)]


def apply_wfac_arrays(x, t1s, t2s, red: Reduction):
    """Factored four-step twiddle multiply on a (rows, cols) value whose
    ROWS are the linear exponent axis c = c1*S + c0 (twiddles.fourstep_wfac_T
    orientation): x * T1[c1] * T2[c0] as two chained broadcast constant
    multiplies. t1s: red.n_tables arrays (rows/S, cols); t2s: (S, cols).
    Shared by the Pallas kernel and the XLA/distributed engines."""
    rr, cc = x.shape
    s = t2s[0].shape[0]
    xr = x.reshape(rr // s, s, cc)
    xr = red.mul_const(xr, *(t.reshape(rr // s, 1, cc) for t in t1s))
    xr = red.mul_const(xr, *(t.reshape(1, s, cc) for t in t2s))
    return xr.reshape(rr, cc)


def default_fuse(direction: str, nested: bool = False) -> int:
    """Measured-optimal radix-2^K group size per butterfly direction.

    Plain columns (v5e, B=64, n1=1024, harvey4 — DESIGN.md §3): K=3 for
    DIF (4+ spills vregs in the whole-half-vectorized net), K=5 for the
    parts-form DIT net, whose per-leaf ops keep register pressure flat.

    Nested columns (round-4 rescan, scripts/scan_nested_fuse.py, one
    session, B=64): full occupancy flips the DIF economics — per-stage
    radix-2 (K=1) beats K=3 by ~14% (71.7 vs 83.4 us/NTT-share; the
    concats are cheap full-vreg copies while the deep recursion costs
    registers). DIT stays parts K=5 (4680 ~= tree K=4's 4669, parts
    keeps the lazy-subtree domains)."""
    if direction == "dit":
        return 5
    return 1 if nested else 3


def run_stages(x, tws: list, direction: str, red: Reduction, *,
               fuse: int | None = None, dit_net: str = "parts",
               ts: list | None = None):
    """len(tws) butterfly stages over axis 0 of a (nn, c) value, fused in
    radix-2^K groups: K stages per single full-size concat/reshape round,
    with every sub feeding a constant-multiply skipping its conditional
    correction (sub_for_mul: Shoup accepts any x < 2^32). Bit-exact with
    the sequential radix-2 loops by construction.

    tws: per-stage tuples of twiddle arrays (values, already read from
    refs), DIF order = largest stride first. fuse=None resolves per
    direction (default_fuse). ts: explicit per-stage half-block sizes —
    used by the nested column phases (twiddles.col_network), whose
    expanded strides don't follow the standard full-transform schedule;
    None = the standard schedule for a len(tws)-stage transform over nn
    rows.

    dit_net selects the DIT group network ('parts' default; canonical
    outputs identical across all three, raw lazy-domain bits may differ
    — regression-tested):
    - 'parts': the structural mirror of net_dif — leaf parts, zero
      internal concats, lazy v-subtrees. Measured (v5e, B=64, n1=1024,
      harvey4, us/pass): plain 6554 vs tree 7910; +transpose 6386 vs
      7693; +wmat+canon 6861 vs 9932 — closes the round-2 inverse
      premium from ~1.5x to ~1.14x of forward.
    - 'tree': the round-2 recursive build-up (two concats per internal
      node).
    - 'iter': level-by-level on the whole block array (one concat per
      level, no lazy domains) — measured worse (9729 plain): the lazy
      savings beat the concat reduction.
    """
    nn, c = x.shape
    logn = len(tws)
    if fuse is None:
        fuse = default_fuse(direction)
    if ts is None:
        ts = _stage_shapes(nn, direction)[:logn]
    subm = red.sub_for_mul or red.sub

    def net_dif(arr, vecs, tl):
        # arr: (blocks, 2^r, tl, c); vecs[0] = largest-stride stage.
        # Returns leaf parts (blocks, 1, tl, c) in output row order.
        r = arr.shape[1]
        if r == 1:
            return [arr]
        half = r // 2
        u = arr[:, :half]
        v = arr[:, half:]
        w = tuple(wv.reshape(1, half, tl, 1) for wv in vecs[0])
        upper = red.add(u, v)
        lower = red.mul_const(subm(u, v), *w)
        return net_dif(upper, vecs[1:], tl) + net_dif(lower, vecs[1:], tl)

    def net_dit(arr, vecs, tl, lazy=False):
        # vecs[-1] = largest-stride stage (applied at this level). Whole-
        # half vectorized like net_dif: the twiddle vector in leaf order
        # IS wv reshaped (half, tl) (leaf i owns rows i*tl..(i+1)*tl), so
        # one mul_const/add/sub over the concatenated halves replaces the
        # per-leaf loop (radix small ops -> log2(radix) big ops per
        # group).
        #
        # lazy: this node's ENTIRE output feeds the parent's mul_const
        # (it is a v-half subtree within the fused group), so the add/sub
        # conditional corrections can be skipped where the reduction
        # allows (Shoup accepts any x < 2^32; child-1 inputs stay
        # corrected, so u + wv < 2*dom < 2^32). The group's top level is
        # never lazy — group outputs stay in the travel domain. Raw
        # lazy-domain bits then differ from the fuse=1 network (values
        # stay congruent mod p and canonicalize identically).
        r = arr.shape[1]
        if r == 1:
            return [arr]
        half = r // 2
        add_ = (red.add_for_mul if lazy and red.add_for_mul else red.add)
        sub_ = (red.sub_for_mul if lazy and red.sub_for_mul else red.sub)
        u_parts = net_dit(arr[:, :half], vecs[:-1], tl)
        v_parts = net_dit(arr[:, half:], vecs[:-1], tl, lazy=True)
        u = u_parts[0] if len(u_parts) == 1 else jnp.concatenate(
            u_parts, axis=1)
        v = v_parts[0] if len(v_parts) == 1 else jnp.concatenate(
            v_parts, axis=1)
        w = tuple(wv.reshape(1, half, tl, 1) for wv in vecs[-1])
        wv_ = red.mul_const(v, *w)
        return [add_(u, wv_), sub_(u, wv_)]

    def net_dit_parts(arr, vecs, tl, lazy=False):
        # The exact structural mirror of net_dif: recurse on contiguous
        # halves, return LEAF PARTS in output row order, and let the
        # caller do the single per-group concat — zero internal concats
        # (the tree net pays two per internal node). The parent's twiddle
        # multiply is applied per part against the matching (tl,) slice
        # of the level's twiddle vector; lazy v-subtrees keep the tree
        # net's one-level domain trick (u from a corrected child, so
        # u + w*v < 2*dom < 2^32 is legal Shoup input).
        r = arr.shape[1]
        if r == 1:
            return [arr]
        half = r // 2
        add_ = (red.add_for_mul if lazy and red.add_for_mul else red.add)
        sub_ = (red.sub_for_mul if lazy and red.sub_for_mul else red.sub)
        u_parts = net_dit_parts(arr[:, :half], vecs[:-1], tl)
        v_parts = net_dit_parts(arr[:, half:], vecs[:-1], tl, lazy=True)
        ws = tuple(wv.reshape(half, tl) for wv in vecs[-1])
        outs_add, outs_sub = [], []
        for i, (u, v) in enumerate(zip(u_parts, v_parts)):
            wi = tuple(wv[i].reshape(1, 1, tl, 1) for wv in ws)
            wv_ = red.mul_const(v, *wi)
            outs_add.append(add_(u, wv_))
            outs_sub.append(sub_(u, wv_))
        return outs_add + outs_sub

    def net_dit_iter(arr, vecs, tl):
        # Iterative bottom-up DIT group. Level ell (smallest stride
        # first) pairs radix-index j with j + 2^ell inside nested
        # 2^(ell+1)-blocks, so u/v are CONTIGUOUS halves of a reshape
        # view at every level — one two-part concat per level puts
        # (u + w*v, u - w*v) back in place. Same mul/add/sub count as
        # the tree net; k concats per group instead of the tree's
        # 2(2^(k-1)-1) internal ones. Fully corrected domains (no lazy
        # variants): a level's outputs feed BOTH the next level's u
        # (needs the travel domain) and its mul input, so the one-level
        # lazy trick of the tree net does not apply positionally.
        blocks, radix = arr.shape[0], arr.shape[1]
        x = arr
        for ell, wv in enumerate(vecs):
            half = 1 << ell
            r2 = half * 2
            x = x.reshape(blocks * radix // r2, r2, tl, c)
            u = x[:, :half]
            v = x[:, half:]
            w = tuple(t.reshape(1, half, tl, 1) for t in wv)
            wv_ = red.mul_const(v, *w)
            x = jnp.concatenate([red.add(u, wv_), red.sub(u, wv_)], axis=1)
        return [x.reshape(blocks, radix, tl, c)]

    s = 0
    while s < logn:
        k = min(fuse, logn - s)
        radix = 1 << k
        tl = ts[s + k - 1] if direction == "dif" else ts[s]
        blocks = nn // (radix * tl)
        vecs = tws[s : s + k]
        if direction == "dif":
            net = net_dif
        else:
            net = {"iter": net_dit_iter, "parts": net_dit_parts,
                   "tree": net_dit}[dit_net]
        parts = net(x.reshape(blocks, radix, tl, c), vecs, tl)
        x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
        x = x.reshape(nn, c)
        s += k
    return x


def run_col_network(x, tws, direction: str, red: Reduction, *,
                    phases_ts, mid_vals, rs, fuse=None, dit_net="parts"):
    """The column transform's stage section on an (nn, c) value: one or
    two run_stages phases per twiddles.col_network, with the nested
    mid step between them (DIF: wmid multiply then the (R, S) -> (S, R)
    sublane-block row transpose; DIT: the exact mirror). Shared by the
    Pallas kernels (refs already read) and the XLA engines, so the
    spectral order cannot diverge.

    tws: per-stage table tuples for ALL phases in order; mid_vals: the
    wmid table tuple ((nn, 1) values) or None; rs: (R, S)."""
    nn, c_ = x.shape
    if fuse is None:
        fuse = default_fuse(direction, nested=mid_vals is not None)
    if mid_vals is None:
        return run_stages(x, tws, direction, red, fuse=fuse,
                          dit_net=dit_net, ts=list(phases_ts[0]))
    R, S = rs
    k0 = len(phases_ts[0])
    x = run_stages(x, tws[:k0], direction, red, fuse=fuse,
                   dit_net=dit_net, ts=list(phases_ts[0]))
    wm = tuple(w.reshape(nn, 1) for w in mid_vals)
    if direction == "dif":
        x = red.mul_const(x, *wm)
        x = x.reshape(R, S, c_).swapaxes(0, 1).reshape(nn, c_)
    else:
        x = x.reshape(S, R, c_).swapaxes(0, 1).reshape(nn, c_)
        x = red.mul_const(x, *wm)
    return run_stages(x, tws[k0:], direction, red, fuse=fuse,
                      dit_net=dit_net, ts=list(phases_ts[1]))


def make_col_transform(field, nn: int, *, direction: str,
                       inverse: bool = False, red: Reduction,
                       fuse: int | None = 1):
    """Pure-jnp column transform over (nn, c) arrays — the XLA-engine
    twin of the Pallas colpass's stage section, compiled from the SAME
    twiddles.col_network schedule so the two engines cannot diverge on
    the spectral order (CLAUDE.md invariant). Tables are closure
    constants (jnp arrays). fuse=1 keeps CPU compiles cheap; the Pallas
    kernel owns the measured deeper-fusion defaults."""
    import jax.numpy as _jnp

    from ntt_aie_tpu import twiddles as _tw

    net = _tw.col_network(field, nn, direction=direction, inverse=inverse)
    tws = []
    phases_ts = []
    for ph in net["phases"]:
        tws.extend(
            tuple(_jnp.asarray(np.ascontiguousarray(t.reshape(-1, 1)))
                  for t in red.prepare_table(v))
            for v in ph["vecs"])
        phases_ts.append(tuple(ph["ts"]))
    wmid_t = None
    if net["mid"] is not None:
        wmid_t = tuple(_jnp.asarray(np.ascontiguousarray(t.reshape(-1, 1)))
                       for t in red.prepare_table(net["mid"]["wmid"]))

    def run(x):
        return run_col_network(x, tws, direction, red,
                               phases_ts=phases_ts, mid_vals=wmid_t,
                               rs=(net["R"], net["S"]), fuse=fuse)

    return run


def build_colpass(
    *,
    n1: int,
    n2: int,
    red: Reduction,
    direction: str,  # 'dif' | 'dit'
    twiddle_pos: str = "none",  # 'none' | 'pre' | 'post' | 'post_t'
    # 'post_t' (round 5): apply the multiply AFTER the fused output
    # transpose, in the transposed layout — the wmat operand is then
    # (n2, n1)-oriented and blocked like the output. This is how the
    # four-step twiddle folds into pass 1's exit instead of pass 2's
    # entry (same elementwise values — the multiply commutes with the
    # store/load between passes — so outputs are bit-identical by
    # construction; an earlier 'post'+transpose_out fusion attempt
    # measured 4x slower because the multiply ran in the PRE-transpose
    # layout and Mosaic relayouted the product; post_t multiplies the
    # already-transposed tile). Requires transpose_out=True.
    twiddle_pos2: str = "none",  # optional SECOND elementwise multiply —
    # lets a pass fuse e.g. a 'pre' four-step matrix AND a 'post'
    # negacyclic psi^-1 scaling with zero extra HBM round trips
    canonicalize: bool = False,
    block_lanes: int | None = None,
    batch: int = 1,
    transpose_out: bool = False,
    interpret: bool = False,
    fuse: int | None = None,
    dit_net: str = "parts",
    wfac_pos: str = "none",  # 'none' | 'pre' | 'post': FACTORED four-step
    # twiddle multiply (twiddles.fourstep_wfac_T): rows split c = c1*S + c0,
    # applied as TWO chained broadcast constant-multiplies against
    # (n1/S + S) x block_lanes tables instead of one n1 x block_lanes
    # matrix — ~sqrt(n1)/2 x less twiddle HBM traffic per slab.
    wfac_split: int = 0,  # S; required when wfac_pos != 'none'
    rank1_pos: str = "none",  # 'none' | 'pre' | 'post': rank-1 elementwise
    # multiply row_factor[r] * col_factor[c] (e.g. the negacyclic psi
    # matrix, which is exactly rank-1) — two broadcast constant multiplies
    # against (n1 + n2)-entry vectors instead of an n1 x n2 matrix.
    phases_ts: tuple | None = None,  # nested column network (round 4,
    # twiddles.col_network): per-phase explicit half-block-size lists.
    # None = one standard full-depth phase. With two phases the kernel
    # runs a mid step between them: DIF = wmid multiply then the
    # (R, S) -> (S, R) row transpose; DIT = the mirror (transpose back,
    # then the inverse wmid). Every stage's minor dims stay
    # (>= min(R, S), lanes) — the full-sublane-occupancy fix.
    mid_rs: tuple = (0, 0),  # (R, S); required when len(phases_ts) == 2
):
    """Returns a pallas_call fn(x, *stage_tw_cols, *[wmid tables],
    *[wmat tables]) -> y running all butterfly stages (and optionally the
    four-step twiddle multiply) on (n1, block_lanes) VMEM slabs, gridded
    over n2 // block_lanes.

    x: (n1, n2) uint32 — or (batch, n1, n2) when batch > 1 (the batch rides
    an inner grid axis so shared tables are fetched once per lane-slab, not
    once per batch element). Each stage twiddle is red.n_tables arrays of
    shape (t_s, 1); the nested wmid (when phases_ts has two phases) is
    red.n_tables arrays of shape (n1, 1); wmat is red.n_tables arrays of
    shape (n1, n2); factored operands (wfac_pos) are red.n_tables arrays
    of (n1/S, n2) plus red.n_tables of (S, n2).

    transpose_out=True writes each slab transposed to the mirrored block of
    a (n2, n1) output — the four-step transpose fused into the pass for
    free (no separate transpose kernel, no extra HBM round trip).
    """
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
    nt = red.n_tables
    if block_lanes is None:
        # Wider slabs amortize per-grid-step overhead (measured on v5e:
        # 512 lanes beats 128 by ~40% at n1=1024); the ~16 live slab-sized
        # stage temporaries must still fit scoped VMEM (100 MB budget):
        # 1 MB slabs (2^20/n1 lanes, 16 MB live) capped at 512. Round 3
        # raised the cap from 512 KB slabs for tall columns — at the
        # n=2^24 4096-row shape, 256 lanes measured 3853 vs 5435 µs/NTT
        # at 128 (B=16, −29%).
        block_lanes = max(128, min(512, (1 << 20) // max(n1, 1)))
    block_lanes = min(block_lanes, n2)
    assert n2 % block_lanes == 0
    grid = n2 // block_lanes

    ntm = red.mat_tables  # full-matrix operands may use a packed form
    n_wm1 = ntm if twiddle_pos != "none" else 0
    n_wm2 = ntm if twiddle_pos2 != "none" else 0
    S = wfac_split
    if wfac_pos != "none":
        if not (0 < S < n1 and n1 % S == 0):
            raise ValueError(
                f"wfac_split {S} must be a proper divisor of rows n1={n1} "
                f"(need 0 < S < n1 and n1 % S == 0)")
    n_wf = 2 * nt if wfac_pos != "none" else 0
    n_r1 = 2 * nt if rank1_pos != "none" else 0

    n_mid = nt if nested else 0

    def kernel(*refs):
        x_ref = refs[0]
        tw_refs = refs[1 : 1 + logn * nt]
        mid_refs = refs[1 + logn * nt : 1 + logn * nt + n_mid]
        idx = 1 + logn * nt + n_mid
        wmat_refs = refs[idx : idx + n_wm1]
        wmat2_refs = refs[idx + n_wm1 : idx + n_wm1 + n_wm2]
        wfac_refs = refs[idx + n_wm1 + n_wm2 : idx + n_wm1 + n_wm2 + n_wf]
        r1_refs = refs[idx + n_wm1 + n_wm2 + n_wf :
                       idx + n_wm1 + n_wm2 + n_wf + n_r1]
        out_ref = refs[-1]

        def apply_rank1(x):
            rr, cc = x.shape
            w_r = tuple(r[:].reshape(rr, 1) for r in r1_refs[:nt])
            w_c = tuple(r[:].reshape(1, cc) for r in r1_refs[nt:])
            return red.mul_const(red.mul_const(x, *w_r), *w_c)

        def apply_wfac(x):
            # x rows are the linear exponent axis c = c1*S + c0: multiply
            # by T1[c1] broadcast over c0, then T2[c0] broadcast over c1.
            # Two Shoup muls per element against (n1/S + S)-row tables.
            return apply_wfac_arrays(x, [r[:] for r in wfac_refs[:nt]],
                                     [r[:] for r in wfac_refs[nt:]], red)

        x = x_ref[:]
        if batch > 1:
            x = x.reshape(x.shape[-2], x.shape[-1])
        if twiddle_pos == "pre":
            wm = tuple(r[:].reshape(x.shape) for r in wmat_refs)
            x = red.mulc_mat(x, *wm)
        if twiddle_pos2 == "pre":
            wm = tuple(r[:].reshape(x.shape) for r in wmat2_refs)
            x = red.mulc_mat(x, *wm)
        if wfac_pos == "pre":
            x = apply_wfac(x)
        if rank1_pos == "pre":
            x = apply_rank1(x)

        tws = [tuple(tw_refs[s * nt + k][:] for k in range(nt))
               for s in range(logn)]
        x = run_col_network(
            x, tws, direction, red, phases_ts=phases_ts,
            mid_vals=(tuple(r[:] for r in mid_refs) if nested else None),
            rs=(R_mid, S_mid), fuse=fuse, dit_net=dit_net)
        if twiddle_pos == "post":
            wm = tuple(r[:].reshape(x.shape) for r in wmat_refs)
            x = red.mulc_mat(x, *wm)
        if twiddle_pos2 == "post":
            wm = tuple(r[:].reshape(x.shape) for r in wmat2_refs)
            x = red.mulc_mat(x, *wm)
        if wfac_pos == "post":
            x = apply_wfac(x)
        if rank1_pos == "post":
            x = apply_rank1(x)
        if not has_post_t:
            if canonicalize:
                x = red.canonicalize(x)
            if transpose_out:
                x = x.T
        else:
            # post_t: transpose FIRST, then multiply in the transposed
            # layout (operands arrive output-blocked), then canonicalize
            x = x.T
            if twiddle_pos == "post_t":
                wm = tuple(r[:].reshape(x.shape) for r in wmat_refs)
                x = red.mulc_mat(x, *wm)
            if twiddle_pos2 == "post_t":
                wm = tuple(r[:].reshape(x.shape) for r in wmat2_refs)
                x = red.mulc_mat(x, *wm)
            if canonicalize:
                x = red.canonicalize(x)
        out_ref[:] = x.reshape(out_ref.shape)

    # Block specs. Batched grids are (lane_slab, batch): batch innermost so
    # the (stage twiddles, wmat) blocks keep identical indices across
    # consecutive steps and the Pallas pipeline skips re-fetching them.
    if batch == 1:
        x_spec = pl.BlockSpec((n1, block_lanes), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
        wmat_spec = x_spec
        # post_t operands are (n2, n1)-oriented, blocked like the
        # transposed output
        wmat_t_spec = pl.BlockSpec((block_lanes, n1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
        wfac_specs = ([pl.BlockSpec((n1 // S, block_lanes), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)] * nt
                      + [pl.BlockSpec((S, block_lanes), lambda i: (0, i),
                                      memory_space=pltpu.VMEM)] * nt
                      ) if n_wf else []
        rank1_specs = ([pl.BlockSpec((n1, 1), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)] * nt
                       + [pl.BlockSpec((1, block_lanes), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)] * nt
                       ) if n_r1 else []
        tw_specs = [
            pl.BlockSpec((t, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
            for t in ts for _ in range(nt)
        ]
        tw_specs += [pl.BlockSpec((n1, 1), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)] * n_mid
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
        wfac_specs = ([pl.BlockSpec((n1 // S, block_lanes),
                                    lambda i, b: (0, i),
                                    memory_space=pltpu.VMEM)] * nt
                      + [pl.BlockSpec((S, block_lanes), lambda i, b: (0, i),
                                      memory_space=pltpu.VMEM)] * nt
                      ) if n_wf else []
        rank1_specs = ([pl.BlockSpec((n1, 1), lambda i, b: (0, 0),
                                     memory_space=pltpu.VMEM)] * nt
                       + [pl.BlockSpec((1, block_lanes), lambda i, b: (0, i),
                                       memory_space=pltpu.VMEM)] * nt
                       ) if n_r1 else []
        tw_specs = [
            pl.BlockSpec((t, 1), lambda i, b: (0, 0), memory_space=pltpu.VMEM)
            for t in ts for _ in range(nt)
        ]
        tw_specs += [pl.BlockSpec((n1, 1), lambda i, b: (0, 0),
                                  memory_space=pltpu.VMEM)] * n_mid
        if transpose_out:
            out_spec = pl.BlockSpec((1, block_lanes, n1), lambda i, b: (b, i, 0),
                                    memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((batch, n2, n1), jnp.uint32)
        else:
            out_spec = x_spec
            out_shape = jax.ShapeDtypeStruct((batch, n1, n2), jnp.uint32)
        full_grid = (grid, batch)
    in_specs = [x_spec] + tw_specs
    in_specs.extend(
        [wmat_t_spec if twiddle_pos == "post_t" else wmat_spec] * n_wm1)
    in_specs.extend(
        [wmat_t_spec if twiddle_pos2 == "post_t" else wmat_spec] * n_wm2)
    in_specs.extend(wfac_specs)
    in_specs.extend(rank1_specs)

    butterflies = (n1 // 2) * logn * block_lanes
    return pl.pallas_call(
        kernel,
        grid=full_grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * butterflies * grid * batch,
            bytes_accessed=(2 + (n_wm1 + n_wm2) // max(nt, 1)) * n1 * n2 * 4 * batch,
            transcendentals=0,
        ),
    )


class PallasColpass:
    """Bundles the pallas_call with its prepared twiddle operands."""

    def __init__(self, fn, tw_cols: list, wmat_tables: tuple | None,
                 wmat2_tables: tuple | None = None,
                 wfac_tables: tuple | None = None,
                 rank1_tables: tuple | None = None):
        self.fn = fn
        self.tw_cols = [jnp.asarray(t) for t in tw_cols]
        self.wmat = (
            tuple(jnp.asarray(w) for w in wmat_tables) if wmat_tables else None
        )
        self.wmat2 = (
            tuple(jnp.asarray(w) for w in wmat2_tables) if wmat2_tables else None
        )
        self.wfac = (
            tuple(jnp.asarray(w) for w in wfac_tables) if wfac_tables else None
        )
        self.rank1 = (
            tuple(jnp.asarray(w) for w in rank1_tables) if rank1_tables
            else None
        )

    def __call__(self, x):
        args = [x] + self.tw_cols
        if self.wmat is not None:
            args.extend(self.wmat)
        if self.wmat2 is not None:
            args.extend(self.wmat2)
        if self.wfac is not None:
            args.extend(self.wfac)
        if self.rank1 is not None:
            args.extend(self.rank1)
        return self.fn(*args)


def make_colpass(
    field,
    n1: int,
    n2: int,
    *,
    reduction: str,
    direction: str,
    inverse_tw: bool = False,
    wmat: np.ndarray | None = None,
    twiddle_pos: str = "none",
    wmat2: np.ndarray | None = None,
    twiddle_pos2: str = "none",
    canonicalize: bool = False,
    interpret: bool = False,
    block_lanes: int | None = None,
    batch: int = 1,
    transpose_out: bool = False,
    fuse: int | None = None,
    dit_net: str = "parts",
    wfac: tuple | None = None,
    wfac_pos: str = "none",
    rank1: tuple | None = None,
    rank1_pos: str = "none",
) -> PallasColpass:
    """Build a column pass for n1-point NTTs over an (n1, n2) matrix.

    wmat/wmat2: optional host-side int64/object (n1, n2) twiddle matrices
    (any bit-reversal baked in by the caller), applied at their positions
    (e.g. wmat 'pre' four-step matrix + wmat2 'post' psi^-1 scaling).
    wfac: factored alternative to wmat — (T1, T2) host matrices from
    twiddles.fourstep_wfac_T with T1 (n1/S, n2), T2 (S, n2); applied at
    wfac_pos as two chained constant multiplies (same values mod p,
    ~S x less twiddle traffic).
    rank1: (row_factor (n1,), col_factor (n2,)) host vectors for an
    exactly rank-1 elementwise multiply (twiddles.negacyclic_psi_factors)
    applied at rank1_pos — 1-D operands instead of an n1 x n2 matrix.
    """
    from ntt_aie_tpu import twiddles as tw

    red = make_reduction(reduction, field)
    net = tw.col_network(field, n1, direction=direction, inverse=inverse_tw)
    tw_cols: list[np.ndarray] = []
    for ph in net["phases"]:
        for v in ph["vecs"]:
            for tab in red.prepare_table(v):
                tw_cols.append(np.ascontiguousarray(tab.reshape(-1, 1)))
    if net["mid"] is not None:
        for tab in red.prepare_table(net["mid"]["wmid"]):
            tw_cols.append(np.ascontiguousarray(tab.reshape(-1, 1)))
    wmat_tables = red.prep_mat(wmat) if wmat is not None else None
    wmat2_tables = red.prep_mat(wmat2) if wmat2 is not None else None
    wfac_tables = None
    wfac_split = 0
    if wfac is not None:
        t1, t2 = wfac
        wfac_split = n1 // t1.shape[0]
        wfac_tables = tuple(red.prepare_table(t1)) + tuple(red.prepare_table(t2))
    rank1_tables = None
    if rank1 is not None:
        rvec, cvec = rank1
        rank1_tables = (
            tuple(np.ascontiguousarray(t.reshape(n1, 1))
                  for t in red.prepare_table(rvec))
            + tuple(np.ascontiguousarray(t.reshape(1, n2))
                    for t in red.prepare_table(cvec)))
    fn = build_colpass(
        n1=n1,
        n2=n2,
        red=red,
        direction=direction,
        twiddle_pos=twiddle_pos,
        twiddle_pos2=twiddle_pos2,
        canonicalize=canonicalize,
        interpret=interpret,
        block_lanes=block_lanes,
        batch=batch,
        transpose_out=transpose_out,
        fuse=fuse,
        dit_net=dit_net,
        wfac_pos=wfac_pos if wfac is not None else "none",
        wfac_split=wfac_split,
        rank1_pos=rank1_pos if rank1 is not None else "none",
        phases_ts=tuple(tuple(ph["ts"]) for ph in net["phases"]),
        mid_rs=(net["R"], net["S"]),
    )
    return PallasColpass(fn, tw_cols, wmat_tables, wmat2_tables, wfac_tables,
                         rank1_tables)


def build_fused_fourstep(
    *,
    field,
    n1: int,
    n2: int,
    red: Reduction,
    inverse: bool = False,
    has_pre: bool = False,
    has_post: bool = False,
    batch: int = 1,
    interpret: bool = False,
):
    """BOTH four-step passes in ONE kernel: the whole (n1, n2) matrix lives
    in VMEM, the transpose happens in-register, and HBM is touched exactly
    once in and once out per transform (vs twice for the two-kernel path).
    Interleaved A/B on the shared v5e measured parity at best vs the
    two-kernel slab pipeline (an initial +14% reading was co-tenant
    noise), so build_plan only uses this when asked (fused=True); it may
    win on unshared chips. VMEM bounds apply: ~12 live matrix-sized
    temporaries must fit the 120 MB budget.

    Forward: [pre ⊙] DIF over n1 -> T -> ⊙ wmid -> DIF over n2 -> canon.
    Inverse: DIT over n2 -> T -> ⊙ wmid -> DIT over n1 [-> post ⊙] -> canon.
    Argument order: x, tw_a stage cols, tw_b stage cols, wmid (nt), [pre
    (nt)], [post (nt)]. tw_a = the FIRST stage set applied (n1 for forward,
    n2 for inverse); wmid shaped like the post-transpose matrix.
    """
    from ntt_aie_tpu import twiddles as _tw

    loga, logb = ((n1.bit_length() - 1, n2.bit_length() - 1) if not inverse
                  else (n2.bit_length() - 1, n1.bit_length() - 1))
    direction = "dit" if inverse else "dif"
    nn_a, nn_b = (n1, n2) if not inverse else (n2, n1)
    # Column networks from the shared schedule (nested for >= 256 rows:
    # keeps this opt-in whole-matrix mode on the same spectral order as
    # the two-pass pipeline).
    net_a = _tw.col_network(field, nn_a, direction=direction,
                            inverse=inverse)
    net_b = _tw.col_network(field, nn_b, direction=direction,
                            inverse=inverse)
    ts_a = [t for ph in net_a["phases"] for t in ph["ts"]]
    ts_b = [t for ph in net_b["phases"] for t in ph["ts"]]
    nmid_a = red.n_tables if net_a["mid"] is not None else 0
    nmid_b = red.n_tables if net_b["mid"] is not None else 0
    nt = red.n_tables
    ntm = red.mat_tables

    def kernel(*refs):
        x_ref = refs[0]
        i = 1
        twa = refs[i : i + loga * nt]; i += loga * nt
        mida = refs[i : i + nmid_a]; i += nmid_a
        twb = refs[i : i + logb * nt]; i += logb * nt
        midb = refs[i : i + nmid_b]; i += nmid_b
        wmid = refs[i : i + ntm]; i += ntm
        pre = refs[i : i + ntm] if has_pre else (); i += ntm if has_pre else 0
        post = refs[i : i + ntm] if has_post else ()
        out_ref = refs[-1]

        x = x_ref[:].reshape(nn_a, nn_b)
        if has_pre:
            x = red.mulc_mat(x, *(r[:].reshape(x.shape) for r in pre))
        tws_a = [tuple(twa[s * nt + k][:] for k in range(nt))
                 for s in range(loga)]
        x = run_col_network(
            x, tws_a, direction, red,
            phases_ts=tuple(tuple(ph["ts"]) for ph in net_a["phases"]),
            mid_vals=(tuple(r[:] for r in mida) if nmid_a else None),
            rs=(net_a["R"], net_a["S"]))
        x = x.T
        x = red.mulc_mat(x, *(r[:].reshape(x.shape) for r in wmid))
        tws_b = [tuple(twb[s * nt + k][:] for k in range(nt))
                 for s in range(logb)]
        x = run_col_network(
            x, tws_b, direction, red,
            phases_ts=tuple(tuple(ph["ts"]) for ph in net_b["phases"]),
            mid_vals=(tuple(r[:] for r in midb) if nmid_b else None),
            rs=(net_b["R"], net_b["S"]))
        if has_post:
            x = red.mulc_mat(x, *(r[:].reshape(x.shape) for r in post))
        out_ref[:] = red.canonicalize(x).reshape(out_ref.shape)

    def whole(shape):
        if batch == 1:
            return pl.BlockSpec(shape, lambda: tuple(0 for _ in shape),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1,) + shape,
                            lambda b: (b,) + tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    def const2d(shape):
        if batch == 1:
            return pl.BlockSpec(shape, lambda: (0, 0), memory_space=pltpu.VMEM)
        return pl.BlockSpec(shape, lambda b: (0, 0), memory_space=pltpu.VMEM)

    in_specs = [whole((nn_a, nn_b))]
    in_specs += [const2d((t, 1)) for t in ts_a for _ in range(nt)]
    in_specs += [const2d((nn_a, 1))] * nmid_a         # nested mid, side a
    in_specs += [const2d((t, 1)) for t in ts_b for _ in range(nt)]
    in_specs += [const2d((nn_b, 1))] * nmid_b         # nested mid, side b
    in_specs += [const2d((nn_b, nn_a))] * ntm         # wmid (post-transpose)
    if has_pre:
        in_specs += [const2d((nn_a, nn_b))] * ntm
    if has_post:
        in_specs += [const2d((nn_b, nn_a))] * ntm
    out_sh = (nn_b, nn_a) if batch == 1 else (batch, nn_b, nn_a)

    return pl.pallas_call(
        kernel,
        grid=() if batch == 1 else (batch,),
        in_specs=in_specs,
        out_specs=whole((nn_b, nn_a)),
        out_shape=jax.ShapeDtypeStruct(out_sh, jnp.uint32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )


def make_fused_fourstep(
    field,
    n1: int,
    n2: int,
    *,
    reduction: str,
    inverse: bool = False,
    wmid: np.ndarray,
    pre: np.ndarray | None = None,
    post: np.ndarray | None = None,
    batch: int = 1,
    interpret: bool = False,
) -> PallasColpass:
    """Single-kernel four-step transform; see build_fused_fourstep."""
    from ntt_aie_tpu import twiddles as tw

    red = make_reduction(reduction, field)
    direction = "dit" if inverse else "dif"
    nn_a, nn_b = (n1, n2) if not inverse else (n2, n1)
    cols: list[np.ndarray] = []
    for nn in (nn_a, nn_b):
        net = tw.col_network(field, nn, direction=direction, inverse=inverse)
        for ph in net["phases"]:
            for v in ph["vecs"]:
                for tab in red.prepare_table(v):
                    cols.append(np.ascontiguousarray(tab.reshape(-1, 1)))
        if net["mid"] is not None:
            for tab in red.prepare_table(net["mid"]["wmid"]):
                cols.append(np.ascontiguousarray(tab.reshape(-1, 1)))
    tail = list(red.prep_mat(wmid))
    if pre is not None:
        tail += list(red.prep_mat(pre))
    if post is not None:
        tail += list(red.prep_mat(post))
    fn = build_fused_fourstep(
        field=field, n1=n1, n2=n2, red=red, inverse=inverse,
        has_pre=pre is not None, has_post=post is not None,
        batch=batch, interpret=interpret,
    )
    return PallasColpass(fn, cols, tuple(tail))
