"""Bit-layout contract tests (SURVEY.md §2a)."""

import jax.numpy as jnp
import numpy as np

from csgn_tpu import layout
from csgn_tpu.context import Context


def test_words_for_reference_context():
    ctx = Context(1247, 16)
    assert ctx.words64 == 20          # reference defaultLen (src/Context.cpp:24-28)
    assert ctx.words32 == 40
    assert ctx.s == 38                # 1247 // 32
    assert ctx.bitlen == (64,) * 19 + (31,)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(7)
    for n in [1, 31, 32, 33, 63, 64, 65, 95, 1247, 4096]:
        bits = rng.integers(0, 2, size=(3, n)).astype(np.uint8)
        words = layout.pack_bits(jnp.asarray(bits))
        assert words.shape == (3, layout.words32_for(n))
        back = layout.unpack_bits(words, n)
        np.testing.assert_array_equal(np.asarray(back), bits)


def test_msb_first_placement():
    # Bit j lands in word j//32 at shift 31 - (j%32).
    n = 95
    for j in [0, 1, 31, 32, 63, 64, 94]:
        bits = np.zeros(n, dtype=np.uint8)
        bits[j] = 1
        words = np.asarray(layout.pack_bits(jnp.asarray(bits)))
        expect = np.zeros(layout.words32_for(n), dtype=np.uint32)
        expect[j // 32] = np.uint32(1) << (31 - (j % 32))
        np.testing.assert_array_equal(words, expect)


def test_u64_u32_bijection():
    rng = np.random.default_rng(3)
    w64 = rng.integers(0, 2**64, size=(4, 20), dtype=np.uint64)
    w32 = layout.u64_to_u32(w64)
    assert w32.shape == (4, 40)
    np.testing.assert_array_equal(layout.u32_to_u64(w32), w64)
    # hi half holds the MSB-first earlier bits: bit 0 of the uint64 word
    # (shift 63) must be bit 0 of the hi uint32 (shift 31).
    one = np.array([np.uint64(1) << np.uint64(63)], dtype=np.uint64)
    np.testing.assert_array_equal(layout.u64_to_u32(one), [1 << 31, 0])


def test_u64_split_matches_uniform_u32_rule():
    # Packing bits to u32 directly == packing to u64 (reference layout) then
    # splitting.  This is the exact statement of layout compatibility.
    rng = np.random.default_rng(11)
    n = 1247
    bits = rng.integers(0, 2, size=n).astype(np.uint8)
    w32 = np.asarray(layout.pack_bits(jnp.asarray(bits)))

    # Host-side reference-style u64 packing: bit j -> word j//64, shift 63-(j%64).
    w64 = np.zeros(20, dtype=np.uint64)
    for j in range(n):
        if bits[j]:
            w64[j // 64] |= np.uint64(1) << np.uint64(63 - (j % 64))
    np.testing.assert_array_equal(layout.u64_to_u32(w64), w32)


def test_valid_mask():
    ctx = Context(1247, 16)
    vm = ctx.valid_mask
    assert vm.shape == (40,)
    # First 38 words fully occupied; word 38 has top 31 bits; word 39 empty.
    assert np.all(vm[:38] == np.uint32(0xFFFFFFFF))
    assert vm[38] == np.uint32(0xFFFFFFFE)
    assert vm[39] == 0


def test_bit_positions_to_mask():
    n = 70
    m = layout.bit_positions_to_mask(np.array([0, 33, 69]), n)
    bits = np.asarray(layout.unpack_bits(jnp.asarray(m), n))
    assert list(np.nonzero(bits)[0]) == [0, 33, 69]


def test_format_bits():
    n = 8
    words = layout.pack_bits(jnp.asarray(np.array([1, 0, 1, 1, 0, 0, 0, 1], dtype=np.uint8)))
    assert layout.format_bits(np.asarray(words), n) == "10110001"
