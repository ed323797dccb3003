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

__all__ = ["encrypt_bits_pallas"]


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
