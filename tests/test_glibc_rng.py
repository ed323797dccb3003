"""GlibcRand must match the platform's actual glibc rand() bit-for-bit."""

import ctypes
import ctypes.util

import pytest

from csgn_tpu.rng import GlibcRand


def _libc():
    libc = ctypes.CDLL(ctypes.util.find_library("c"))
    libc.rand.restype = ctypes.c_int
    libc.srand.argtypes = [ctypes.c_uint]
    return libc


@pytest.mark.parametrize("seed", [1, 42, 424242, 2**31 - 1, 0])
def test_matches_real_glibc(seed):
    libc = _libc()
    libc.srand(seed)
    ours = GlibcRand(seed)
    for _ in range(1000):
        assert ours.rand() == libc.rand()


def test_randmod_sequence():
    g1 = GlibcRand(99)
    g2 = GlibcRand(99)
    vals = [g1.randmod(2) for _ in range(100)]
    raw = [g2.rand() % 2 for _ in range(100)]
    assert vals == raw
