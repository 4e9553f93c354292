"""Twiddle-factor planning.

The reference broadcasts one full natural-order table ``table[i] = w^i`` to
every tile (reference src/test.cpp:27-32 generation; src/aie2.py:96-104
multicast FIFO) and indexes it per stage as ``table[h+i]``. That doesn't
scale to n = 2^24 (SURVEY.md §7 hard part 5), so this planner produces:

- the reference-compatible natural-order power table (for bit-exact parity),
- per-stage packed twiddle vectors for the DIF/DIT stage loops, laid out so a
  stage's multiply is a broadcast along the lane axis of the (rows, lanes)
  matrix layout (no gathers on device),
- four-step "super-twiddle" matrices w^(k1*j2) for the N = N1 x N2
  decomposition, sliced per shard,
- everything optionally premultiplied into Montgomery form so device-side
  mont_mul(standard_data, mont_twiddle) yields standard-form products.

All tables are computed in NumPy int64/object and delivered as uint32 (or
2 x uint32 limbs for Goldilocks).
"""

from __future__ import annotations

import os
from collections import OrderedDict

import numpy as np

from ntt_aie_tpu.fields import PrimeField, modpow



def _tw_dtype(p: int):
    """int64 for word primes; Python bignum (object) for >=63-bit primes."""
    return object if p >= (1 << 62) else np.int64

def power_table(field: PrimeField, n: int, *, inverse: bool = False) -> np.ndarray:
    """Natural-order table t[i] = w^i with w = g^((p-1)//n), as int64.

    This is exactly the reference's make_roots output (src/test.cpp:27-32) —
    including its *integer division* (p-1)/n: for the reference's committed
    config (p=3329, n=2048) n does not divide p-1, so w = g^1 = 3 is not a
    2048th root of unity at all. Bit-exact parity requires reproducing that.
    Use root_of_unity()/dif_stage_twiddles() for true NTTs.
    """
    w = modpow(field.g, (field.p - 1) // n, field.p)
    if inverse:
        w = field.inv(w)
    p = field.p
    out = np.empty(n, dtype=_tw_dtype(p))
    acc = 1
    for i in range(n):
        out[i] = acc
        acc = (acc * w) % p
    return out


def bit_reverse_indices(n: int) -> np.ndarray:
    """Bit-reversal permutation of [0, n)."""
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for _ in range(bits):
        rev = (rev << 1) | (idx & 1)
        idx >>= 1
    return rev


def dif_stage_twiddles(field: PrimeField, n: int, *, inverse: bool = False) -> list[np.ndarray]:
    """Twiddles for the Gentleman-Sande DIF NTT, natural in -> bit-reversed out.

    Stage s (s = 0..log2(n)-1) works at half-block size t = n >> (s+1); pairs
    (j, j+t) inside blocks of 2t; butterfly (u+v, (u-v)*w[jj]) with
    w[jj] = omega^(jj * 2^s) for jj in [0, t). Returns one int64 vector of
    length t per stage.
    """
    logn = n.bit_length() - 1
    w = field.root_of_unity(n)
    if inverse:
        w = field.inv(w)
    p = field.p
    stages = []
    for s in range(logn):
        t = n >> (s + 1)
        step = 1 << s
        vec = np.empty(t, dtype=_tw_dtype(p))
        acc = 1
        mult = modpow(w, step, p)
        for jj in range(t):
            vec[jj] = acc
            acc = (acc * mult) % p
        stages.append(vec)
    return stages


def dit_stage_twiddles(field: PrimeField, n: int, *, inverse: bool = False) -> list[np.ndarray]:
    """Twiddles for the Cooley-Tukey DIT NTT, bit-reversed in -> natural out.

    Stage s works at half-block size t = 2^s; butterfly
    (u + w[jj]*v, u - w[jj]*v) with w[jj] = omega^(jj * n/(2t)).
    Returns one int64 vector of length t per stage.
    """
    logn = n.bit_length() - 1
    w = field.root_of_unity(n)
    if inverse:
        w = field.inv(w)
    p = field.p
    stages = []
    for s in range(logn):
        t = 1 << s
        step = n >> (s + 1)
        vec = np.empty(t, dtype=_tw_dtype(p))
        acc = 1
        mult = modpow(w, step, p)
        for jj in range(t):
            vec[jj] = acc
            acc = (acc * mult) % p
        stages.append(vec)
    return stages


def pack_stage_twiddles(stages: list[np.ndarray], n: int) -> np.ndarray:
    """Pack per-stage vectors into one (logn, n//2) matrix, each stage's
    vector tiled to length n//2 so device code can slice row s without
    per-stage shapes. DIF stage s has length t = n>>(s+1): tile it
    (n//2)//t times (the tile repeats across blocks, matching broadcast
    semantics). DIT stage s has length t = 2^s: also tiles to n//2."""
    half = n // 2
    logn = n.bit_length() - 1
    out = np.zeros((logn, half), dtype=stages[0].dtype)
    for s, vec in enumerate(stages):
        reps = half // len(vec)
        out[s] = np.tile(vec, reps)
    return out


def root_powers(field: PrimeField, n: int) -> np.ndarray:
    """w^i for i in [0, n), w = field.root_of_unity(n), via log-depth block
    doubling (out[m:2m] = out[:m] * w^m). Contiguous vectorized mulmods —
    ~20x faster than a sequential recurrence at the n=2^24 north-star shape
    (1.0s vs 21s for the full fourstep_tables build)."""
    p = field.p
    out = np.empty(n, dtype=_tw_dtype(p))
    out[0] = 1
    if n == 1:
        return out
    cur = field.root_of_unity(n)  # w^m for the current block width m
    m = 1
    while m < n:
        step = min(m, n - m)
        out[m:m + step] = out[:step] * cur % p
        m *= 2
        if m < n:
            cur = cur * cur % p
    return out


def fourstep_twiddle_matrix(
    field: PrimeField, n1: int, n2: int, *, inverse: bool = False,
    _pows: np.ndarray | None = None,
) -> np.ndarray:
    """The (n1, n2) matrix W[k1, j2] = omega_{n1*n2}^(k1*j2), int64.

    Used between the column-NTT and row-NTT passes of the four-step
    decomposition (SURVEY.md §5.7). Built as a gather from one shared
    power table: exponent (k1*j2) mod n is a mask (n is a power of two),
    and the inverse matrix is the same table at (n - e) mod n — so one
    table serves both directions (pass ``_pows=root_powers(field, n)``).
    """
    n = n1 * n2
    pows = root_powers(field, n) if _pows is None else _pows
    k1 = np.arange(n1, dtype=np.int64)
    j2 = np.arange(n2, dtype=np.int64)
    e = (k1[:, None] * j2[None, :]) & (n - 1)
    if inverse:
        e = (n - e) & (n - 1)
    return pows[e]


def spectral_positions(n1: int, n2: int) -> np.ndarray:
    """pos such that natural[k] = flat[pos[k]] for the four-step plans'
    flat spectral output flat[c*n1 + r] = X[br2(c)*n1 + br1(r)]
    (flat path n2 == 1: plain bit reversal)."""
    br1 = bit_reverse_indices(n1)
    if n2 == 1:
        return br1.astype(np.int32)
    br2 = bit_reverse_indices(n2)
    # pos[c*n1 + r] = br2[c]*n1 + br1[r]: a broadcast, not a 16M-element
    # div/mod/gather (10x faster at the n=2^24 north-star shape).
    return (br2[:, None].astype(np.int32) * np.int32(n1)
            + br1[None, :].astype(np.int32)).ravel()


def _build_fourstep_tables(field: PrimeField, n1: int, n2: int):
    n = n1 * n2
    n_inv = field.inv(n)
    # One shared power table; the pass-1 bit reversal is folded into the
    # exponent rows (pows[(br1(r)*j2) mod n] == W[br1(r), j2]) and the
    # inverse matrix reuses the same exponents at (n - e) mod n.
    pows = root_powers(field, n)
    k1r = bit_reverse_indices(n1).astype(np.int64)
    j2 = np.arange(n2, dtype=np.int64)
    e = (k1r[:, None] * j2[None, :]) & (n - 1)
    wmat = pows[e]
    iwmat = pows[(n - e) & (n - 1)]
    if _tw_dtype(field.p) is object:
        iwmat_scaled = iwmat.astype(object) * n_inv % field.p
    else:
        iwmat_scaled = (
            iwmat.astype(np.uint64) * np.uint64(n_inv) % np.uint64(field.p)
        ).astype(np.int64)
    return {
        "wmat": wmat,
        "iwmat_scaled": iwmat_scaled,
        "pos": spectral_positions(n1, n2),
        "n_inv": n_inv,
    }


# ---- fourstep_tables caching ------------------------------------------------
#
# Plan setup is dominated by this build (DESIGN.md §3: ~6 s at the n=2^24
# north-star shape even after the log-depth root_powers rebuild). The tables
# are pure functions of (p, g, n1, n2), so they cache safely at two levels:
#
#   - in-process LRU: repeated plan builds in one process (CLI verify+bench,
#     batched builders, the test suite) pay the build once per config. Cached
#     arrays are returned read-only so an accidental in-place mutation raises
#     instead of corrupting every later plan.
#   - on-disk (opt-in): NTT_AIE_TPU_TABLE_CACHE=<dir> persists the two twiddle
#     matrices across processes — a serving restart at n=2^24 then costs an
#     np.load + a sampled correctness check instead of the rebuild. Word
#     primes only (Goldilocks tables are Python-bignum object arrays, which
#     npz cannot store without pickle; they keep the in-process memo).
#     Loads are validated by recomputing 8 deterministic sample entries with
#     scalar modpow — a corrupt or mismatched file falls back to a rebuild.
#
# The reference has no analog (its twiddle table is built at graph compile
# time and broadcast, src/aie2.py:96-104); this is serving-restart
# infrastructure for the large-n configs the reference never reaches.

_FOURSTEP_MEMO: OrderedDict = OrderedDict()
_FOURSTEP_MEMO_MAX = 8


def _freeze_tables(tabs: dict) -> dict:
    for v in tabs.values():
        if isinstance(v, np.ndarray):
            v.setflags(write=False)
    return tabs


def _fourstep_cache_path(field: PrimeField, n1: int, n2: int) -> str | None:
    d = os.environ.get("NTT_AIE_TPU_TABLE_CACHE")
    if not d or _tw_dtype(field.p) is object:
        return None
    return os.path.join(d, f"fourstep_p{field.p}_g{field.g}_{n1}x{n2}_v1.npz")


def _fourstep_sample_check(field: PrimeField, n1: int, n2: int,
                           wmat: np.ndarray, iwmat_scaled: np.ndarray) -> bool:
    """Spot-check 8 deterministic entries of a loaded table pair against
    direct scalar modpow (the ground-truth definition, not the vectorized
    builder)."""
    n, p = n1 * n2, field.p
    w = field.root_of_unity(n)
    n_inv = field.inv(n)
    k1r = bit_reverse_indices(n1)
    rs = np.random.default_rng(n1 * 31 + n2)
    for _ in range(8):
        r, c = int(rs.integers(n1)), int(rs.integers(n2))
        e = (int(k1r[r]) * c) % n
        if int(wmat[r, c]) != modpow(w, e, p):
            return False
        if int(iwmat_scaled[r, c]) != modpow(w, (n - e) % n, p) * n_inv % p:
            return False
    return True


def fourstep_tables(field: PrimeField, n1: int, n2: int):
    """The four-step plan's host tables, shared by every plan builder
    (single-chip 32-bit, Goldilocks, distributed): returns a dict with

      wmat         — forward twiddle matrix with the pass-1 output bit
                     reversal baked into its rows (W[br1(r), j2]),
      iwmat_scaled — inverse matrix likewise, additionally folding 1/n,
      pos          — spectral_positions(n1, n2).

    Entries are int64 for word primes, Python objects for Goldilocks.
    Cached (in-process always; on disk when NTT_AIE_TPU_TABLE_CACHE is a
    directory) — returned arrays are read-only; copy before mutating.
    """
    key = (field.p, field.g, n1, n2)
    hit = _FOURSTEP_MEMO.get(key)
    if hit is not None:
        _FOURSTEP_MEMO.move_to_end(key)
        return hit

    tabs = None
    path = _fourstep_cache_path(field, n1, n2)
    if path is not None and os.path.exists(path):
        try:
            with np.load(path) as z:
                wmat = z["wmat"]
                iwmat_scaled = z["iwmat_scaled"]
            if (wmat.shape == (n1, n2) and iwmat_scaled.shape == (n1, n2)
                    and _fourstep_sample_check(field, n1, n2, wmat,
                                               iwmat_scaled)):
                tabs = {"wmat": wmat, "iwmat_scaled": iwmat_scaled,
                        "pos": spectral_positions(n1, n2),
                        "n_inv": field.inv(n1 * n2)}
        except Exception:
            tabs = None  # unreadable/corrupt file -> rebuild below

    if tabs is None:
        tabs = _build_fourstep_tables(field, n1, n2)
        if path is not None:
            try:
                os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
                tmp = f"{path}.tmp{os.getpid()}"
                with open(tmp, "wb") as f:
                    np.savez(f, wmat=tabs["wmat"],
                             iwmat_scaled=tabs["iwmat_scaled"])
                os.replace(tmp, path)  # atomic: concurrent builders race safely
            except OSError:
                pass  # cache dir unwritable: serve the built tables anyway

    _FOURSTEP_MEMO[key] = _freeze_tables(tabs)
    while len(_FOURSTEP_MEMO) > _FOURSTEP_MEMO_MAX:
        _FOURSTEP_MEMO.popitem(last=False)
    return tabs


def fourstep_tables_light(field: PrimeField, n1: int, n2: int):
    """pos + n_inv only: the factored-twiddle plans (wmat_factored=True)
    apply the four-step multiply from fourstep_wfac_T's sqrt-size tables
    and never materialize the n1 x n2 matrices, so their setup skips the
    O(n) gather build and the 2 x n x 8 B host footprint (2 x 134 MB at
    the n=2^24 north-star shape)."""
    return {"pos": spectral_positions(n1, n2), "n_inv": field.inv(n1 * n2)}


def default_wfac_split(n2: int) -> int:
    """Balanced split for the factored four-step twiddle matrix:
    S ~ sqrt(n2) minimizes the summed table rows n2/S + S."""
    return 1 << ((n2.bit_length() - 1) // 2)


def fourstep_wfac_T(field: PrimeField, n1: int, n2: int, *,
                    inverse: bool = False, scale: int | None = None,
                    split: int | None = None,
                    _pows: np.ndarray | None = None):
    """Factored four-step twiddle matrix, TRANSPOSED orientation.

    The full matrix wmat.T[c, r] = W^(+-br1(r) * c) [* scale] (rows c are
    LINEAR in the exponent; the pass-1 bit reversal rides the lane axis r)
    factors over c = c1*S + c0 as T1[c1, r] * T2[c0, r] with

        T1[c1, r] = W^(+-br1(r) * S * c1)         shape (n2/S, n1)
        T2[c0, r] = W^(+-br1(r) * c0) [* scale]   shape (S, n1)

    Entrywise product mod p equals the full matrix (tested), so a kernel
    can apply the four-step twiddle multiply as TWO chained constant
    multiplies against (n2/S + S) * n1 table entries instead of n1 * n2 —
    ~sqrt(n2)/2 x less twiddle HBM traffic and host build. `scale` (e.g.
    1/n for the inverse) folds into T2. Spectral-order convention shared
    with fourstep_tables (the single source of truth, CLAUDE.md).

    The O(n) power table dominates this build; callers constructing
    several factored tables (fwd + inv + poly-inv) should build it once
    with root_powers(field, n) and pass it as ``_pows``.
    """
    n = n1 * n2
    S = split or default_wfac_split(n2)
    if n2 % S != 0:
        raise ValueError(f"split {S} must divide n2={n2}")
    pows = root_powers(field, n) if _pows is None else _pows
    k1r = bit_reverse_indices(n1).astype(np.int64)
    sgn = -1 if inverse else 1
    c1 = (np.arange(n2 // S, dtype=np.int64) * S)[:, None]
    c0 = np.arange(S, dtype=np.int64)[:, None]
    t1 = pows[(sgn * k1r[None, :] * c1) % n]
    t2 = pows[(sgn * k1r[None, :] * c0) % n]
    if scale is not None:
        if _tw_dtype(field.p) is object:
            t2 = t2.astype(object) * scale % field.p
        else:
            t2 = (t2.astype(np.uint64) * np.uint64(scale)
                  % np.uint64(field.p)).astype(np.int64)
    return np.ascontiguousarray(t1), np.ascontiguousarray(t2)


def negacyclic_psi_factors(field: PrimeField, n1: int, n2: int, *,
                           inverse: bool = False):
    """Rank-1 factorization of the negacyclic psi matrix: the (n1, n2)
    reshape of psi^i has psi^(r*n2 + c) = (psi^n2)^r * psi^c exactly, so
    it is row_factor[r] * col_factor[c] — two 1-D vectors (n1 + n2
    entries) replacing an n1*n2 matrix operand. Same psi convention as
    negacyclic_psi_powers (tested entrywise)."""
    n = n1 * n2
    psi = field.root_of_unity(2 * n)
    if inverse:
        psi = field.inv(psi)
    p = field.p
    dt = _tw_dtype(p)
    col = np.empty(n2, dtype=dt)
    acc = 1
    for c in range(n2):
        col[c] = acc
        acc = acc * psi % p
    row = np.empty(n1, dtype=dt)
    a = modpow(psi, n2, p)
    acc = 1
    for r in range(n1):
        row[r] = acc
        acc = acc * a % p
    return row, col


def negacyclic_psi_powers(field: PrimeField, n: int, *, inverse: bool = False) -> np.ndarray:
    """psi^i for i in [0, n) where psi is a primitive 2n-th root (psi^2 = omega).

    Pre/post-scaling vectors for negacyclic convolution (X^n + 1 quotient
    ring, RLWE-style; BASELINE.json config 3)."""
    psi = field.root_of_unity(2 * n)
    if inverse:
        psi = field.inv(psi)
    p = field.p
    out = np.empty(n, dtype=_tw_dtype(p))
    acc = 1
    for i in range(n):
        out[i] = acc
        acc = (acc * psi) % p
    return out


