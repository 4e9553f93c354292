"""ctypes binding to the native C++ golden oracle (native/oracle.cc).

The reference keeps its golden model native (src/test.cpp:34-60); so do we:
the compiled oracle pins exact 64-bit semantics independently of
NumPy/Python, and generates large test vectors ~100x faster than the NumPy
oracle. Builds on demand with `make -C native` (g++ only, no deps).
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libnttoracle.so"
_lib = None


class NativeOracleUnavailable(RuntimeError):
    pass


def _build() -> None:
    if not (_NATIVE_DIR / "Makefile").exists():
        raise NativeOracleUnavailable(
            f"native sources not found at {_NATIVE_DIR} — the C++ oracle "
            "ships with the repository checkout, not the installed wheel; "
            "run from a git clone (or skip --native gates)"
        )
    subprocess.run(
        ["make", "-C", str(_NATIVE_DIR)],
        check=True,
        capture_output=True,
        text=True,
    )


def load(build: bool = True) -> ctypes.CDLL:
    """Load (building if needed) the native oracle library."""
    global _lib
    if _lib is not None:
        return _lib
    if build:
        # Always run make (dependency-checked, so a no-op when current):
        # guarantees the loaded library matches the checked-out sources.
        try:
            _build()
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            if not _LIB_PATH.exists():
                raise NativeOracleUnavailable(f"native build failed: {e}") from e
    if not _LIB_PATH.exists():
        raise NativeOracleUnavailable(f"{_LIB_PATH} not built")
    lib = ctypes.CDLL(str(_LIB_PATH))

    u64, u32, i64 = ctypes.c_uint64, ctypes.c_uint32, ctypes.c_int64
    pi64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    pu64 = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")

    lib.ntt_modpow.restype = u64
    lib.ntt_modpow.argtypes = [u64, u64, u64]
    lib.ntt_barrett_mulmod.restype = u32
    lib.ntt_barrett_mulmod.argtypes = [u32, u32, u32, u32, u32]
    lib.ntt_mont_mulmod.restype = u32
    lib.ntt_mont_mulmod.argtypes = [u32, u32, u32, u32]
    lib.ntt_goldilocks_mulmod.restype = u64
    lib.ntt_goldilocks_mulmod.argtypes = [u64, u64]
    lib.ntt_goldilocks_reduce128.restype = u64
    lib.ntt_goldilocks_reduce128.argtypes = [u64, u64]
    lib.ntt_reference_network.restype = None
    lib.ntt_reference_network.argtypes = [pi64, i64, pi64, i64, i64]
    lib.ntt_make_power_table.restype = None
    lib.ntt_make_power_table.argtypes = [pi64, i64, i64, i64]
    lib.ntt_block_permute16.restype = None
    lib.ntt_block_permute16.argtypes = [pi64, pi64, i64]
    lib.ntt_dif_u64.restype = None
    lib.ntt_dif_u64.argtypes = [pu64, i64, u64, u64]
    lib.ntt_dit_u64.restype = None
    lib.ntt_dit_u64.argtypes = [pu64, i64, u64, u64, ctypes.c_int]
    lib.ntt_dif_u64_batch.restype = None
    lib.ntt_dif_u64_batch.argtypes = [pu64, i64, i64, u64, u64]
    lib.ntt_cyclic_polymul_u64.restype = None
    lib.ntt_cyclic_polymul_u64.argtypes = [pu64, pu64, pu64, i64, u64, u64]
    lib.ntt_negacyclic_polymul_u64.restype = None
    lib.ntt_negacyclic_polymul_u64.argtypes = [pu64, pu64, pu64, i64, u64, u64]
    lib.ntt_schoolbook_negacyclic_u64.restype = None
    lib.ntt_schoolbook_negacyclic_u64.argtypes = [pu64, pu64, pu64, i64, u64]

    _lib = lib
    return lib


# ---- numpy-friendly wrappers ----

def reference_network(a, table, p: int, stages: int | None = None) -> np.ndarray:
    lib = load()
    a = np.ascontiguousarray(a, dtype=np.int64).copy()
    table = np.ascontiguousarray(table, dtype=np.int64)
    s = len(a) if stages is None else stages
    lib.ntt_reference_network(a, len(a), table, p, s)
    return a


def make_power_table(n: int, p: int, g: int) -> np.ndarray:
    lib = load()
    out = np.empty(n, dtype=np.int64)
    lib.ntt_make_power_table(out, n, p, g)
    return out


def block_permute16(a) -> np.ndarray:
    lib = load()
    a = np.ascontiguousarray(a, dtype=np.int64)
    out = np.empty_like(a)
    lib.ntt_block_permute16(a, out, len(a))
    return out


def ntt_dif(a, omega: int, p: int) -> np.ndarray:
    lib = load()
    a = np.ascontiguousarray(a, dtype=np.uint64).copy()
    lib.ntt_dif_u64(a, len(a), omega, p)
    return a


def ntt_dif_batch(a, omega: int, p: int) -> np.ndarray:
    """Batched forward DIF over the rows of a (B, n) array (one C call)."""
    lib = load()
    a = np.ascontiguousarray(a, dtype=np.uint64).copy()
    B, n = a.shape
    lib.ntt_dif_u64_batch(a, B, n, omega, p)
    return a


def ntt_dit(a, omega: int, p: int, scale: bool = False) -> np.ndarray:
    lib = load()
    a = np.ascontiguousarray(a, dtype=np.uint64).copy()
    lib.ntt_dit_u64(a, len(a), omega, p, 1 if scale else 0)
    return a


def cyclic_polymul(a, b, omega: int, p: int) -> np.ndarray:
    lib = load()
    a = np.ascontiguousarray(a, dtype=np.uint64)
    b = np.ascontiguousarray(b, dtype=np.uint64)
    c = np.empty_like(a)
    lib.ntt_cyclic_polymul_u64(a, b, c, len(a), omega, p)
    return c


def negacyclic_polymul(a, b, psi: int, p: int) -> np.ndarray:
    lib = load()
    a = np.ascontiguousarray(a, dtype=np.uint64)
    b = np.ascontiguousarray(b, dtype=np.uint64)
    c = np.empty_like(a)
    lib.ntt_negacyclic_polymul_u64(a, b, c, len(a), psi, p)
    return c


def schoolbook_negacyclic(a, b, p: int) -> np.ndarray:
    """Direct O(n^2) schoolbook product mod (X^n + 1, p) — no NTT in the
    oracle path at all (native/oracle.cc ntt_schoolbook_negacyclic_u64)."""
    lib = load()
    a = np.ascontiguousarray(a, dtype=np.uint64)
    b = np.ascontiguousarray(b, dtype=np.uint64)
    c = np.empty_like(a)
    lib.ntt_schoolbook_negacyclic_u64(a, b, c, len(a), p)
    return c


# ---- standalone verification gate (native/verify_main.cc) ----

_BIN_PATH = _NATIVE_DIR / "nttverify"

_KINDS = {"forward": 0, "cyclic_polymul": 1, "negacyclic_polymul": 2,
          "negacyclic_schoolbook": 3}


def write_vectors(path, kind: str, p: int, n: int, root: int, a, claimed,
                  b=None) -> None:
    """Write a .nttv vector file for the nttverify binary (format documented
    in native/verify_main.cc)."""
    import struct

    with open(path, "wb") as f:
        f.write(b"NTTV")
        f.write(struct.pack("<IIQQQ", 1, _KINDS[kind], p, n, root))
        f.write(np.ascontiguousarray(a, dtype=np.uint64).tobytes())
        if b is not None:
            f.write(np.ascontiguousarray(b, dtype=np.uint64).tobytes())
        f.write(np.ascontiguousarray(claimed, dtype=np.uint64).tobytes())


def run_verify_gate(path) -> bool:
    """Run the independently-compiled native gate on a vector file.
    Returns True on PASS. Always invokes make (the Makefile's dependency
    check makes this cheap) so a stale binary can never serve as the
    'independent' gate after oracle.cc/verify_main.cc edits."""
    _build()
    res = subprocess.run([str(_BIN_PATH), str(path)], capture_output=True,
                         text=True)
    if res.returncode != 0:  # surface the binary's mismatch report
        if res.stdout:
            print(res.stdout.strip())
        if res.stderr:
            print(res.stderr.strip())
    return res.returncode == 0


def barrett_mulmod(a: int, b: int, p: int, w: int, u: int) -> int:
    return int(load().ntt_barrett_mulmod(a, b, p, w, u))


def mont_mulmod(a: int, b: int, p: int, neg_pinv: int) -> int:
    return int(load().ntt_mont_mulmod(a, b, p, neg_pinv))


def goldilocks_mulmod(a: int, b: int) -> int:
    return int(load().ntt_goldilocks_mulmod(a, b))


def goldilocks_reduce128(x: int) -> int:
    return int(load().ntt_goldilocks_reduce128(x >> 64, x & ((1 << 64) - 1)))
