"""Butterfly stage loops over (rows, lanes) matrices.

The TPU answer to the reference's two kernel shapes:

- reference ``ntt_stage0_to_Nminus5`` (src/aie_core.cc:189-361) burns 130
  lines of register shuffles on sub-vector strides; here *every* stride is a
  row-axis (sublane) slice of a (rows, lanes) matrix — the lane axis is pure
  SIMD and never shuffled (SURVEY.md §7 hard part 2).
- reference ``ntt_1stage`` (src/aie_core.cc:161-187) does one cross-tile
  stage; here cross-shard stages are either these same loops after an
  all_to_all transpose (four-step) or a ppermute pairwise exchange.

All functions take uint32 arrays shaped (n_rows, lanes), apply butterflies
along axis 0, and multiply through a Reduction strategy (ops/reductions.py).
Twiddle tables are *tuples* of arrays (Harvey carries w and the Shoup w').
Reshapes only split/merge leading axes, which are layout-free on TPU. Used
verbatim under plain jit, inside Pallas kernels, and inside shard_map.
"""

from __future__ import annotations

import jax.numpy as jnp

from ntt_aie_tpu.ops.reductions import Reduction


def dif_stages(x, tw_packed: tuple, p: int, red: Reduction):
    """Gentleman-Sande DIF along axis 0: natural row order in, bit-reversed
    row order out. x: (n, C) uint32; tw_packed: tuple of (log2 n, n//2)
    device tables (1 or 2 arrays per the reduction).

    Stage s: t = n >> (s+1); rows reshaped (blocks, 2, t, C); butterfly
    (u+v, (u-v)*w). Values live in the reduction's domain ([0,2p) lazy for
    Harvey); callers canonicalize at the end of the pipeline.
    """
    n, c = x.shape
    logn = n.bit_length() - 1
    subm = red.sub_for_mul or red.sub
    for s in range(logn):
        t = n >> (s + 1)
        blocks = n // (2 * t)
        xr = x.reshape(blocks, 2, t, c)
        u = xr[:, 0]
        v = xr[:, 1]
        ws = tuple(tp[s].reshape(blocks, t, 1) for tp in tw_packed)
        new_u = red.add(u, v)
        new_v = red.mul_const(subm(u, v), *ws)
        x = jnp.stack([new_u, new_v], axis=1).reshape(n, c)
    return x


def dit_stages(x, tw_packed: tuple, p: int, red: Reduction):
    """Cooley-Tukey DIT along axis 0: bit-reversed row order in, natural out.

    Stage s: t = 2^s; butterfly (u + w*v, u - w*v).
    """
    n, c = x.shape
    logn = n.bit_length() - 1
    for s in range(logn):
        t = 1 << s
        blocks = n // (2 * t)
        xr = x.reshape(blocks, 2, t, c)
        u = xr[:, 0]
        v = xr[:, 1]
        ws = tuple(tp[s].reshape(blocks, t, 1) for tp in tw_packed)
        wv = red.mul_const(v, *ws)
        new_u = red.add(u, wv)
        new_v = red.sub(u, wv)
        x = jnp.stack([new_u, new_v], axis=1).reshape(n, c)
    return x


def reference_network_stages(x, table: tuple, p: int, red: Reduction,
                             stages: int | None = None):
    """The reference oracle's network (src/test.cpp:34-60) on a flat vector,
    increasing stride, table indexed table[h+i] per stage — the bit-exact
    parity path. x: (n,) uint32; table: tuple of (n,) device tables."""
    n = x.shape[0]
    logn = n.bit_length() - 1
    for s in range(logn):
        t = 1 << s
        h = n >> (s + 1)
        xr = x.reshape(h, 2, t)
        u = xr[:, 0]
        v = xr[:, 1]
        roots = tuple(tp[h : 2 * h].reshape(h, 1) for tp in table)
        new_u = red.add(u, v)
        new_v = red.mul_const(red.sub(u, v), *roots)
        x = jnp.stack([new_u, new_v], axis=1).reshape(n)
        if stages is not None and s == stages:
            return red.canonicalize(x)
    return red.canonicalize(x)
