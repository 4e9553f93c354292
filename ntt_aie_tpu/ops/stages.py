"""Butterfly stage loops over (rows, lanes) matrices.

The TPU answer to the reference's two kernel shapes:

- reference ``ntt_stage0_to_Nminus5`` (src/aie_core.cc:189-361) burns 130
  lines of register shuffles on sub-vector strides; here *every* stride is a
  row-axis (sublane) slice of a (rows, lanes) matrix — the lane axis is pure
  SIMD and never shuffled (SURVEY.md §7 hard part 2).
- reference ``ntt_1stage`` (src/aie_core.cc:161-187) does one cross-tile
  stage; here cross-shard stages are either these same loops after an
  all_to_all transpose (four-step) or a ppermute pairwise exchange.

All functions take uint32 arrays shaped (n_rows, lanes) and apply butterflies
along axis 0. Reshapes only split/merge *leading* axes, which are layout-free
on TPU. They are used verbatim in three contexts: under plain jit (XLA path),
inside Pallas kernels (VMEM-resident path), and inside shard_map (per-shard
local passes).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax.numpy as jnp

from ntt_aie_tpu.ops import modops as M


# A mulmod closure: (data, table_form_const) -> data * const mod p.
MulFn = Callable


def make_mul(reduction: str, field) -> tuple[MulFn, MulFn, Callable]:
    """Returns (mul_const, mul_data, table_form).

    mul_const(a, w): a * w mod p where w comes from a table prepared with
      table_form (Montgomery path stores w*R mod p so REDC lands in standard
      form; Barrett stores w directly).
    mul_data(a, b): full a * b mod p for two standard-form data arrays
      (pointwise products).
    table_form(np_int64_table) -> np uint32 table ready for device.
    """
    import numpy as np

    p = field.p
    if reduction == "barrett":
        w_, u_ = field.barrett_w, field.barrett_u
        mul_const = partial(M.barrett_mul, p=p, w=w_, u=u_)
        mul_data = mul_const

        def table_form(t):
            return t.astype(np.uint32)

    elif reduction == "montgomery":
        neg_pinv = field.mont_neg_pinv
        r = field.mont_r_mod_p
        r2 = field.mont_r2_mod_p
        mul_const = partial(M.mont_mul, p=p, neg_pinv=neg_pinv)

        def mul_data(a, b):
            # (a*b*R^-1) * R2 * R^-1 = a*b
            return M.mont_mul(M.mont_mul(a, b, p, neg_pinv), jnp.uint32(r2), p, neg_pinv)

        def table_form(t):
            return (t.astype(object) * r % p).astype(np.uint32)

    else:
        raise ValueError(f"make_mul: unsupported reduction {reduction!r}")

    return mul_const, mul_data, table_form


def dif_stages(x, tw_packed, p: int, mul: MulFn):
    """Gentleman-Sande DIF along axis 0: natural row order in, bit-reversed
    row order out. x: (n, C) uint32; tw_packed: (log2 n, n//2) table-form.

    Stage s: t = n >> (s+1); rows reshaped (blocks, 2, t, C); butterfly
    (u+v, (u-v)*w). Twiddle row s is the stage vector tiled across blocks
    (twiddles.pack_stage_twiddles), so the slice reshapes to (blocks, t, 1)
    and broadcasts over lanes.
    """
    n, c = x.shape
    logn = n.bit_length() - 1
    for s in range(logn):
        t = n >> (s + 1)
        blocks = n // (2 * t)
        xr = x.reshape(blocks, 2, t, c)
        u = xr[:, 0]
        v = xr[:, 1]
        w = tw_packed[s].reshape(blocks, t, 1)
        new_u = M.add_mod(u, v, p)
        new_v = mul(M.sub_mod(u, v, p), w)
        x = jnp.stack([new_u, new_v], axis=1).reshape(n, c)
    return x


def dit_stages(x, tw_packed, p: int, mul: MulFn):
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
        w = tw_packed[s].reshape(blocks, t, 1)
        wv = mul(v, w)
        new_u = M.add_mod(u, wv, p)
        new_v = M.sub_mod(u, wv, p)
        x = jnp.stack([new_u, new_v], axis=1).reshape(n, c)
    return x


def reference_network_stages(x, table, p: int, mul: MulFn, stages: int | None = None):
    """The reference oracle's network (src/test.cpp:34-60) on a flat vector,
    increasing stride, table indexed table[h+i] per stage — the bit-exact
    parity path. x: (n,) uint32; table: (n,) table-form uint32."""
    n = x.shape[0]
    logn = n.bit_length() - 1
    for s in range(logn):
        t = 1 << s
        h = n >> (s + 1)
        xr = x.reshape(h, 2, t)
        u = xr[:, 0]
        v = xr[:, 1]
        roots = table[h : 2 * h].reshape(h, 1)
        new_u = M.add_mod(u, v, p)
        new_v = mul(M.sub_mod(u, v, p), roots)
        x = jnp.stack([new_u, new_v], axis=1).reshape(n)
        if stages is not None and s == stages:
            return x
    return x
