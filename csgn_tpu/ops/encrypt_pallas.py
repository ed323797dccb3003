"""Fused batched encryption with the on-core TPU PRNG.

The default encrypt path (`core.encrypt_bits`) generates randomness with
counter-based threefry — reproducible and splittable, but ~10 VPU ops per
random word.  This kernel uses the TPU's hardware PRNG
(`pltpu.prng_random_bits`) and fuses generation + invariant fix-ups + store
into one pass, targeting pure write bandwidth.

Measured on chip (v5e, 2^22-bit batch, K=16 serial-chained amplification —
.tpuq/enc_r3c): constant fill at this blocking 852 GB/s (write SOL); a
PRNG-generate-and-store-only kernel 729 GB/s (the **PRNG roofline** — the
two extra random rows cost nothing measurable); this kernel 712 GB/s =
4.45 B enc/s at block_b=8192 (664 at 4096, 566 at 2048) — ~98% of the PRNG
roofline, so the remaining lever is the hardware generator itself, not the
invariant fix-ups.

Randomness contract: NOT bit-reproducible against the threefry path (a
different generator) — encryption is randomized, so only the invariants
matter (tests check decrypt round-trip, canonical form, and the bit-0/bit-1
secret-position invariants).  Each grid step seeds the hardware PRNG with a
murmur3-finalized hash of (seed, block id) plus the raw block id as a second
seed word: sequential user seeds and sequential block ids land in unrelated
hash buckets, so streams cannot collide the way raw `seed + program_id`
seeding can (block b of seed s == block b-1 of seed s+1).

Kernel-side gather workaround: Mosaic has no per-lane dynamic gather, so the
random secret index r ∈ [0, d) selects its bit position via a static unroll
over the d key indices (d is small: 16-32).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["encrypt_bits_pallas", "encrypt_bits_counter", "encrypt_bits_counter_ref"]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def encrypt_bits_pallas(
    seed: int,
    bits: jax.Array,
    key_indices: np.ndarray,
    mask: np.ndarray,
    valid_mask: np.ndarray,
    n: int,
    d: int,
    *,
    block_b: int = 8192,
) -> jax.Array:
    """Encrypt bits[batch] -> uint32[W, batch] with the hardware PRNG.

    `key_indices`, `mask`, `valid_mask` are host numpy (static for the
    kernel).  Returns the same invariants as `core.encrypt_bits`:
    bit 1 -> all d secret positions set; bit 0 -> AND over secret positions
    broken at one uniformly chosen position; padding bits zero.
    """
    key_idx = tuple(int(x) for x in np.asarray(key_indices).reshape(-1))
    assert len(key_idx) == d
    w = len(np.asarray(mask).reshape(-1))
    batch = bits.shape[0]
    bb = min(block_b, _round_up(max(batch, 128), 128))
    bp = _round_up(batch, bb)

    bits_in = jnp.pad(jnp.asarray(bits).astype(jnp.uint32), (0, bp - batch)).reshape(1, bp)
    mask_c = jnp.asarray(np.asarray(mask, dtype=np.uint32).reshape(w, 1))
    vm_c = jnp.asarray(np.asarray(valid_mask, dtype=np.uint32).reshape(w, 1))

    seed_lo = int(seed) & 0xFFFFFFFF
    seed_hi = (int(seed) >> 32) & 0xFFFFFFFF

    def kern(bits_ref, mask_ref, vm_ref, o_ref):
        pid = pl.program_id(0).astype(jnp.uint32)
        # murmur3 fmix32 over seed ^ golden-ratio-spread block id.
        h = jnp.uint32(seed_lo) ^ (pid * jnp.uint32(0x9E3779B9)) ^ jnp.uint32(seed_hi)
        h = (h ^ (h >> 16)) * jnp.uint32(0x85EBCA6B)
        h = (h ^ (h >> 13)) * jnp.uint32(0xC2B2AE35)
        h = h ^ (h >> 16)
        pltpu.prng_seed(h, pid)
        words = pltpu.bitcast(pltpu.prng_random_bits((w, bb)), jnp.uint32)
        extra = pltpu.bitcast(pltpu.prng_random_bits((2, bb)), jnp.uint32)
        m = mask_ref[:]
        words = words & vm_ref[:]

        # bit == 1: all secret positions set.
        ones_words = words | m

        # bit == 0: pick r uniformly in [0, d); static unroll over the key.
        # The unroll runs on (1, bb) LANE vectors (select r's word index and
        # bit mask per lane), then expands to (w, bb) with ONE compare+select
        # — an earlier version unrolled d straight (w, bb) selects, ~5x more
        # VPU work per element, and measured VPU-bound below the PRNG
        # roofline (docs/performance.md).
        r = extra[0] % jnp.uint32(d)                           # (bb,)
        r_word = jnp.zeros((bb,), jnp.int32)
        r_bit = jnp.zeros((bb,), jnp.uint32)
        for k, pos in enumerate(key_idx):
            sel = r == jnp.uint32(k)
            r_word = jnp.where(sel, jnp.int32(pos // 32), r_word)
            r_bit = jnp.where(sel, jnp.uint32(1) << (31 - pos % 32), r_bit)
        word_ids = jax.lax.broadcasted_iota(jnp.int32, (w, bb), 0)
        onehot = jnp.where(word_ids == r_word[None, :], r_bit[None, :], jnp.uint32(0))
        mask_wo = m & ~onehot
        others_all_one = jnp.all((words & mask_wo) == mask_wo, axis=0)  # (bb,)
        rand_bit = extra[1] & jnp.uint32(1)
        forced = jnp.where(others_all_one, jnp.uint32(0), rand_bit)[None, :]
        zero_words = (words & ~onehot) | (onehot * forced)

        is_one = (bits_ref[0] & jnp.uint32(1))[None, :] == jnp.uint32(1)
        o_ref[:] = jnp.where(is_one, ones_words, zero_words)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((w, bp), jnp.uint32),
        grid=(bp // bb,),
        in_specs=[
            pl.BlockSpec((1, bb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((w, bb), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(bits_in, mask_c, vm_c)
    return out[:, :batch]


# ---------------------------------------------------------------------------
# Counter-based engine: reproducible across backends, generated in-kernel
# ---------------------------------------------------------------------------
#
# The threefry default above the line is reproducible but leaves the PRNG to
# XLA (371 M enc/s measured); the hardware-PRNG kernel is 12x faster but its
# stream is chip-local.  This engine closes the gap: threefry2x32 (Salmon et
# al., SC'11 — the same generator family jax.random uses) evaluated INSIDE
# the Pallas kernel on counters that depend only on (seed, row, global
# column).  Properties:
#   * deterministic: same (seed, batch index) -> same ciphertext on any
#     backend and any block_b (counters are global, not per-block);
#   * one HBM pass: randomness is generated in VMEM and stored once;
#   * the CPU oracle `encrypt_bits_counter_ref` shares the SAME jnp helpers
#     (`_threefry2x32`, `_encrypt_derive`), so kernel == oracle is structural
#     and is additionally asserted by tests (interpret mode) and the on-chip
#     validation sweep.
#
# Stream spec (fixed; changing it is a format break): R = W + 2 rows padded
# to even, R2 = R // 2.  For pair k in [0, R2) and global column j:
# (y0, y1) = threefry2x32(key=(seed_lo, seed_hi), ctr=(k, j)); stream row k
# is y0, row R2 + k is y1.  Rows [0, W) are the chunk words, row W selects
# the broken secret index (mod d — bias d/2^32, same contract as the
# hardware kernel), row W + 1 supplies the bit-0 coin.


_TF_ROT = (13, 15, 26, 6, 17, 29, 16, 24)


def _rotl(x: jax.Array, r: int) -> jax.Array:
    return (x << jnp.uint32(r)) | (x >> jnp.uint32(32 - r))


def _threefry2x32(k0: int, k1: int, c0: jax.Array, c1: jax.Array):
    """Threefry-2x32-20 over uint32 counter arrays (Random123 spec)."""
    ks = (jnp.uint32(k0), jnp.uint32(k1), jnp.uint32(0x1BD11BDA ^ k0 ^ k1))
    x0 = c0 + ks[0]
    x1 = c1 + ks[1]
    inj = 0
    for i in range(20):
        x0 = x0 + x1
        x1 = _rotl(x1, _TF_ROT[i % 8])
        x1 = x1 ^ x0
        if i % 4 == 3:
            inj += 1
            x0 = x0 + ks[inj % 3]
            x1 = x1 + ks[(inj + 1) % 3] + jnp.uint32(inj)
    return x0, x1


def _counter_stream(seed_lo: int, seed_hi: int, rows: int, bb: int, col0) -> jax.Array:
    """The (rows, bb) uint32 stream starting at global column `col0`."""
    r2 = rows // 2
    c0 = jax.lax.broadcasted_iota(jnp.uint32, (r2, bb), 0)
    c1 = jax.lax.broadcasted_iota(jnp.uint32, (r2, bb), 1) + jnp.uint32(col0)
    y0, y1 = _threefry2x32(seed_lo, seed_hi, c0, c1)
    return jnp.concatenate([y0, y1], axis=0)


def _encrypt_derive(stream, bits_u32, mask_col, vm_col, key_idx, w: int, d: int):
    """Shared invariant fix-up: stream rows -> encrypted words (see module
    docstring; mirrors core.encrypt_bits / reference src/SecretKey.cpp:35-80)."""
    words = stream[:w] & vm_col
    ones_words = words | mask_col
    r = stream[w] % jnp.uint32(d)
    bb = stream.shape[1]
    r_word = jnp.zeros((bb,), jnp.int32)
    r_bit = jnp.zeros((bb,), jnp.uint32)
    for k, pos in enumerate(key_idx):
        sel = r == jnp.uint32(k)
        r_word = jnp.where(sel, jnp.int32(pos // 32), r_word)
        r_bit = jnp.where(sel, jnp.uint32(1) << (31 - pos % 32), r_bit)
    word_ids = jax.lax.broadcasted_iota(jnp.int32, (w, bb), 0)
    onehot = jnp.where(word_ids == r_word[None, :], r_bit[None, :], jnp.uint32(0))
    mask_wo = mask_col & ~onehot
    others_all_one = jnp.all((words & mask_wo) == mask_wo, axis=0)
    rand_bit = stream[w + 1] & jnp.uint32(1)
    forced = jnp.where(others_all_one, jnp.uint32(0), rand_bit)[None, :]
    zero_words = (words & ~onehot) | (onehot * forced)
    is_one = (bits_u32 & jnp.uint32(1))[None, :] == jnp.uint32(1)
    return jnp.where(is_one, ones_words, zero_words)


def _counter_setup(seed, key_indices, mask, valid_mask, d):
    key_idx = tuple(int(x) for x in np.asarray(key_indices).reshape(-1))
    assert len(key_idx) == d
    w = len(np.asarray(mask).reshape(-1))
    rows = _round_up(w + 2, 2)
    seed_lo = int(seed) & 0xFFFFFFFF
    seed_hi = (int(seed) >> 32) & 0xFFFFFFFF
    mask_c = jnp.asarray(np.asarray(mask, dtype=np.uint32).reshape(w, 1))
    vm_c = jnp.asarray(np.asarray(valid_mask, dtype=np.uint32).reshape(w, 1))
    return key_idx, w, rows, seed_lo, seed_hi, mask_c, vm_c


def encrypt_bits_counter_ref(
    seed: int,
    bits: jax.Array,
    key_indices: np.ndarray,
    mask: np.ndarray,
    valid_mask: np.ndarray,
    n: int,
    d: int,
) -> jax.Array:
    """Backend-independent oracle for the counter engine: plain jnp over the
    identical stream spec and derivation.  Bit-exact to
    `encrypt_bits_counter` by construction (shared helpers) and by test."""
    key_idx, w, rows, seed_lo, seed_hi, mask_c, vm_c = _counter_setup(
        seed, key_indices, mask, valid_mask, d
    )
    batch = int(bits.shape[0])
    stream = _counter_stream(seed_lo, seed_hi, rows, batch, 0)
    bits_u32 = jnp.asarray(bits).astype(jnp.uint32)
    return _encrypt_derive(stream, bits_u32, mask_c, vm_c, key_idx, w, d)


def encrypt_bits_counter(
    seed: int,
    bits: jax.Array,
    key_indices: np.ndarray,
    mask: np.ndarray,
    valid_mask: np.ndarray,
    n: int,
    d: int,
    *,
    block_b: int = 8192,
) -> jax.Array:
    """Encrypt bits[batch] -> uint32[W, batch]: counter-based, reproducible.

    Same invariants as `core.encrypt_bits`; same OUTPUT BITS as
    `encrypt_bits_counter_ref` for any block_b and batch (global counters).
    """
    key_idx, w, rows, seed_lo, seed_hi, mask_c, vm_c = _counter_setup(
        seed, key_indices, mask, valid_mask, d
    )
    batch = int(bits.shape[0])
    bb = min(block_b, _round_up(max(batch, 128), 128))
    bp = _round_up(batch, bb)
    bits_in = jnp.pad(
        jnp.asarray(bits).astype(jnp.uint32), (0, bp - batch)
    ).reshape(1, bp)

    def kern(bits_ref, mask_ref, vm_ref, o_ref):
        col0 = pl.program_id(0) * bb
        stream = _counter_stream(seed_lo, seed_hi, rows, bb, col0)
        o_ref[:] = _encrypt_derive(
            stream, bits_ref[0], mask_ref[:], vm_ref[:], key_idx, w, d
        )

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((w, bp), jnp.uint32),
        grid=(bp // bb,),
        in_specs=[
            pl.BlockSpec((1, bb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((w, bb), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(bits_in, mask_c, vm_c)
    return out[:, :batch]
