"""ctypes binding for the native host library (csgn_host.cpp).

Compiled on first use with g++ (no pip/pybind dependency), cached next to the
source; rebuilt automatically when the source changes.
"""

from __future__ import annotations

import ctypes
import hashlib
import pathlib
import subprocess
import threading

import numpy as np

_DIR = pathlib.Path(__file__).parent
_SRC = _DIR / "csgn_host.cpp"
_LOCK = threading.Lock()
_LIB = None


def _build() -> pathlib.Path:
    tag = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    so = _DIR / f"_csgn_host_{tag}.so"
    if not so.exists():
        for stale in _DIR.glob("_csgn_host_*.so"):
            stale.unlink(missing_ok=True)
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             str(_SRC), "-o", str(so)],
            check=True,
            capture_output=True,
        )
    return so


def lib() -> ctypes.CDLL:
    """The loaded native library (compiled on demand)."""
    global _LIB
    with _LOCK:
        if _LIB is None:
            L = ctypes.CDLL(str(_build()))
            u32p = ctypes.POINTER(ctypes.c_uint32)
            i32p = ctypes.POINTER(ctypes.c_int32)
            L.csgn_srand.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
            L.csgn_rand.argtypes = [ctypes.c_void_p]
            L.csgn_rand.restype = ctypes.c_uint32
            L.csgn_ref_encrypt.argtypes = [
                ctypes.c_void_p, ctypes.c_uint32, i32p, ctypes.c_uint64,
                ctypes.c_uint64, u32p,
            ]
            L.csgn_ref_permutation.argtypes = [ctypes.c_void_p, ctypes.c_uint64, i32p]
            L.csgn_mul.argtypes = [u32p, ctypes.c_uint64, u32p, ctypes.c_uint64,
                                   ctypes.c_uint64, u32p]
            L.csgn_decrypt.argtypes = [u32p, ctypes.c_uint64, ctypes.c_uint64, u32p]
            L.csgn_decrypt.restype = ctypes.c_uint32
            L.csgn_permute.argtypes = [u32p, ctypes.c_uint64, ctypes.c_uint64,
                                       i32p, u32p]
            _LIB = L
    return _LIB


def _u32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


class NativeRand:
    """Native glibc-rand emulator (state-compatible with csgn_tpu.rng.GlibcRand)."""

    def __init__(self, seed: int):
        self._st = ctypes.create_string_buffer(128)
        lib().csgn_srand(self._st, seed & 0xFFFFFFFF)

    def rand(self) -> int:
        return int(lib().csgn_rand(self._st))

    # -- reference-exact randomized ops (consume this stream) ---------------

    def ref_encrypt(self, bit: int, indices: np.ndarray, n: int) -> np.ndarray:
        w32 = 2 * (-(-n // 64))
        out = np.zeros(w32, dtype=np.uint32)
        s = np.ascontiguousarray(indices, dtype=np.int32)
        lib().csgn_ref_encrypt(self._st, bit & 1, _i32p(s), len(s), n, _u32p(out))
        return out

    def ref_permutation(self, n: int) -> np.ndarray:
        out = np.zeros(n, dtype=np.int32)
        lib().csgn_ref_permutation(self._st, n, _i32p(out))
        return out


def mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Chunk-major cross-product AND oracle: [t1,W] x [t2,W] -> [t1*t2,W]."""
    a = np.ascontiguousarray(a, dtype=np.uint32)
    b = np.ascontiguousarray(b, dtype=np.uint32)
    t1, w32 = a.shape
    t2, _ = b.shape
    out = np.zeros((t1 * t2, w32), dtype=np.uint32)
    lib().csgn_mul(_u32p(a), t1, _u32p(b), t2, w32, _u32p(out))
    return out


def decrypt(words: np.ndarray, mask: np.ndarray) -> int:
    """Chunk-major decrypt oracle: parity of per-chunk eq-all matches."""
    words = np.ascontiguousarray(words, dtype=np.uint32)
    mask = np.ascontiguousarray(mask, dtype=np.uint32)
    chunks, w32 = words.shape
    return int(lib().csgn_decrypt(_u32p(words), chunks, w32, _u32p(mask)))


def permute(words: np.ndarray, perm: np.ndarray, n: int) -> np.ndarray:
    """Chunk-major permutation oracle: out bit i = in bit perm[i], per chunk."""
    words = np.ascontiguousarray(words, dtype=np.uint32)
    perm = np.ascontiguousarray(perm, dtype=np.int32)
    out = np.zeros_like(words)
    lib().csgn_permute(_u32p(words), words.shape[0], n, _i32p(perm), _u32p(out))
    return out
