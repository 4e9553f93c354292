"""Prototype: nested (R x S) four-step INSIDE the column pass.

Round-4 calibration (measure_vpu_peak) showed the fused colpass runs at
~34% of the chip's ideal butterfly rate (87 vs 254 Gbf/s, one session).
Hypothesis: the small-stride stages (t < 8) operate on (..., t, c) shapes
whose minor-2 dims waste 7/8..1/2 of every vreg's sublanes (weighted
stage-units ~26 vs 10 ideal = the observed ~2.6x). SURVEY.md §7 hard
part 2 prescribes the fix: "four-step even intra-chip".

Formulation that Mosaic accepts (4-D only): decompose the length-n1
column DIF as R x S. Pass 1 is a DIF over R where the S sub-rows ride
INSIDE the stage tile: the (n1, c) slab reshapes to
(blocks, radix, t_R * S, c), so every stage's minor dims are
(t_R * S >= S, c) — full sublane occupancy for ALL stages; the stage
twiddles are host-expanded by repeat(S). A (R, S) -> (S, R) row
transpose (3-D sublane-block permute, 8-aligned) plus a length-n1
twiddle VECTOR (the inner four-step matrix flattened) connects the two
passes; pass 2 mirrors over S with repeat(R).

Output row order: flat[s*R + r] = X[brS(s)*R + brR(r)]
(= tw.spectral_positions(R, S) relative to natural DFT order).

Modes:
    python scripts/proto_nested_colpass.py check   # CPU interpret, bit-exact
    python scripts/proto_nested_colpass.py bench [B] [chain]  # real TPU A/B
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ntt_aie_tpu.utils.platform import honor_platform_env
honor_platform_env()

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ntt_aie_tpu import twiddles as tw
from ntt_aie_tpu.fields import P_469762049 as FIELD
from ntt_aie_tpu.ops.reductions import make_reduction

RED = make_reduction("harvey4", FIELD)


def nested_colpass(n1, n2, *, R=None, batch=1, interpret=False, fuse=3):
    """fn(x) -> y: DIF over n1 rows via nested R x S four-step."""
    R = R or 1 << ((n1.bit_length() - 1) // 2)
    S = n1 // R
    block_lanes = min(512, n2)
    grid = n2 // block_lanes
    ntab = RED.n_tables

    # Stage twiddles, expanded so the passthrough axis rides inside the
    # stage tile: pass-1 stage vectors repeat each entry S times (the S
    # sub-rows of one R-row share the twiddle); pass-2 repeats R times.
    def expand(vec_tabs, reps):
        return [np.ascontiguousarray(np.repeat(t, reps).reshape(-1, 1))
                for t in vec_tabs]

    vecs_R = [expand(RED.prepare_table(v), S)
              for v in tw.dif_stage_twiddles(FIELD, R)]
    vecs_S = [expand(RED.prepare_table(v), R)
              for v in tw.dif_stage_twiddles(FIELD, S)]
    # inner four-step matrix as a flat length-n1 row vector (brR baked in)
    wmid = tw.fourstep_tables(FIELD, R, S)["wmat"]  # (R, S)
    wmid_t = [np.ascontiguousarray(t.reshape(-1, 1))
              for t in RED.prepare_table(wmid.ravel())]
    tabs = ([jnp.asarray(t) for v in vecs_R for t in v]
            + [jnp.asarray(t) for v in vecs_S for t in v]
            + [jnp.asarray(t) for t in wmid_t])

    logR, logS = R.bit_length() - 1, S.bit_length() - 1
    tsR = [(R >> (s + 1)) * S for s in range(logR)]   # effective tl >= S
    tsS = [(S >> (s + 1)) * R for s in range(logS)]   # effective tl >= R

    def net_dif(arr, vecs, tl):
        r_ = arr.shape[1]
        if r_ == 1:
            return [arr]
        half = r_ // 2
        u, v = arr[:, :half], arr[:, half:]
        w = tuple(wv.reshape(1, half, tl, 1) for wv in vecs[0])
        s_ = RED.add(u, v)
        d = RED.sub_for_mul(u, v) if RED.sub_for_mul else RED.sub(u, v)
        m = RED.mul_const(d, *w)
        return net_dif(s_, vecs[1:], tl) + net_dif(m, vecs[1:], tl)

    def sub_dif(x, stage_vals, ts, logn, c):
        # x: (nn, c); DIF along axis 0 with pre-expanded effective strides
        nn = x.shape[0]
        s = 0
        while s < logn:
            k = min(fuse, logn - s)
            radix = 1 << k
            tl = ts[s + k - 1]
            blocks = nn // (radix * tl)
            vecs = [tuple(stage_vals[(s + j) * ntab + i].reshape(-1)
                          for i in range(ntab)) for j in range(k)]
            # stage j's expanded vector has length ts[s+j]*... = radix/2^j
            # ... net_dif reshapes each to (1, half, tl, 1): vec length
            # must equal half*tl at its level — expansion preserves this.
            xr = x.reshape(blocks, radix, tl, c)
            parts = net_dif(xr, vecs, tl)
            x = jnp.concatenate(parts, axis=1).reshape(nn, c)
            s += k
        return x

    def kernel(*refs):
        x_ref = refs[0]
        tR = refs[1:1 + logR * ntab]
        tS = refs[1 + logR * ntab:1 + (logR + logS) * ntab]
        wm = refs[1 + (logR + logS) * ntab:
                  1 + (logR + logS) * ntab + ntab]
        o_ref = refs[-1]
        x = x_ref[:]
        if batch > 1:
            x = x.reshape(x.shape[-2], x.shape[-1])
        c = x.shape[-1]
        x = sub_dif(x, [t[:] for t in tR], tsR, logR, c)
        x = RED.mul_const(x, *(t[:].reshape(n1, 1) for t in wm))
        x = x.reshape(R, S, c).transpose(1, 0, 2).reshape(n1, c)
        x = sub_dif(x, [t[:] for t in tS], tsS, logS, c)
        o_ref[:] = x.reshape(o_ref.shape)

    if batch == 1:
        x_spec = pl.BlockSpec((n1, block_lanes), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
        t_specs = [pl.BlockSpec(t.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM) for t in tabs]
        out_shape = jax.ShapeDtypeStruct((n1, n2), jnp.uint32)
        full_grid = (grid,)
    else:
        x_spec = pl.BlockSpec((1, n1, block_lanes), lambda i, b: (b, 0, i),
                              memory_space=pltpu.VMEM)
        t_specs = [pl.BlockSpec(t.shape, lambda i, b: (0, 0),
                                memory_space=pltpu.VMEM) for t in tabs]
        out_shape = jax.ShapeDtypeStruct((batch, n1, n2), jnp.uint32)
        full_grid = (grid, batch)

    fn = pl.pallas_call(
        kernel, grid=full_grid,
        in_specs=[x_spec] + t_specs,
        out_specs=x_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return (lambda x: fn(x, *tabs)), {"R": R, "S": S}


def check():
    jax.config.update("jax_platforms", "cpu")
    from ntt_aie_tpu import reference as ref

    n1, n2 = 1024, 256
    rng = np.random.default_rng(0)
    x = rng.integers(0, FIELD.p, (n1, n2)).astype(np.uint32)
    fn, meta = nested_colpass(n1, n2, interpret=True)
    got = np.asarray(fn(jnp.asarray(x)))
    got = np.where(got >= 2 * FIELD.p, got - 2 * FIELD.p, got)
    got = np.where(got >= FIELD.p, got - FIELD.p, got).astype(np.int64)
    R, S = meta["R"], meta["S"]
    pos = tw.spectral_positions(R, S)  # natural[k] = flat[pos[k]]
    brev = tw.bit_reverse_indices(n1)
    for j in rng.choice(n2, 4, replace=False):
        X_nat = ref.ntt_dif(x[:, j].astype(np.int64), FIELD)[brev]
        want_flat = np.empty(n1, dtype=np.int64)
        want_flat[pos] = X_nat
        assert np.array_equal(got[:, j], want_flat), f"col {j} mismatch"
    print(f"check OK: nested {R}x{S} col-DIF bit-exact "
          f"(order = spectral_positions({R},{S}))")


def bench():
    from ntt_aie_tpu.ops import pallas_ntt as PN
    from ntt_aie_tpu.profiling import roofline
    from ntt_aie_tpu.utils.timing import time_device
    import json

    B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    chain = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n1 = 1024
    n2 = 1024
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, FIELD.p, (B, n1, n2)).astype(np.uint32))

    ideal = roofline.measure_vpu_peak(iters=6, repeats=4)
    peak = ideal["butterflies_per_sec"]
    print(json.dumps({"probe": "ideal", "gbf": round(peak / 1e9, 1),
                      "dispatch_us": round(ideal["dispatch_us_per_op"], 0)}))

    plain = PN.make_colpass(FIELD, n1, n2, reduction="harvey4",
                            direction="dif", batch=B)
    variants = [("plain colpass (current)", lambda v: plain(v))]
    for fz in (2, 3):
        nested, meta = nested_colpass(n1, n2, batch=B, fuse=fz)
        variants.append((f"nested {meta['R']}x{meta['S']} fuse={fz}", nested))

    def compose(f):
        def run(v):
            for _ in range(chain):
                v = f(v).reshape(B, n1, n2)
            return v
        return jax.jit(run)

    bf = B * n2 * (n1 // 2) * (n1.bit_length() - 1)
    for name, f in variants:
        res = time_device(compose(f), x, iters=3, repeats=4)
        us = res["us_per_iter"] / chain
        gbf = bf / (us * 1e-6) / 1e9
        print(json.dumps({"pass": name, "us_per_call": round(us, 1),
                          "gbf": round(gbf, 1),
                          "pct_ideal": round(100 * gbf * 1e9 / peak, 1)}))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    (check if mode == "check" else bench)()
