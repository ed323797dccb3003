"""On-chip encrypt-invariant statistics at the large context (r4 VERDICT 7).

A job-local clone kernel reproduces the production encrypt kernel's exact
PRNG consumption (same murmur3 seeding, same draw order; see
ops/encrypt_pallas.py) but also emits the raw streams; an XLA reconstruction
from those streams must equal the production output bit-for-bit (clone
fidelity), after which the streams are trusted to carry the true
forced-index choices r and per-position bits.  Checks:

  1. chi-square of r over [0, d) (df = d-1), global and per block
  2. per-secret-position set-bit z-test (~Bernoulli(1/2))
  3. adjacent-chunk duplicate scan (stream collisions)
  4. cross-seed shifted-block equality (block b of seed s vs b-1 of s+1 --
     the collision mode the murmur3 seeding exists to prevent)

Catches PRNG seeding bias the roundtrip tests cannot see (reference
invariant: /root/reference/src/SecretKey.cpp:35-80).  Run on the real chip
via the .tpuq worker: the archived r4 run is artifacts/enc_stats_r4.out
(chi2 29.4, |z|max 2.7, zero collisions).
"""

import sys
for m in [m for m in sys.modules if m.startswith("csgn_tpu")]:
    del sys.modules[m]
if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from csgn_tpu.context import Context
from csgn_tpu.secret_key import SecretKey
from csgn_tpu.ops.encrypt_pallas import encrypt_bits_pallas

ctx = Context(4095, 32)
W, D, N = ctx.words32, ctx.d, ctx.n
sk = SecretKey.generate(ctx, jax.random.key(3))
key_idx = tuple(int(x) for x in np.asarray(sk.indices).reshape(-1))
BATCH = 1 << 20
BB = 8192
SEED = 424242

vm_c = jnp.asarray(np.asarray(ctx.valid_mask, np.uint32).reshape(W, 1))


def streams(seed, batch, bb=BB):
    """Emit the exact (words, extra) PRNG draws of encrypt_bits_pallas."""
    seed_lo = int(seed) & 0xFFFFFFFF
    seed_hi = (int(seed) >> 32) & 0xFFFFFFFF

    def kern(vm_ref, w_ref, e_ref):
        pid = pl.program_id(0).astype(jnp.uint32)
        h = jnp.uint32(seed_lo) ^ (pid * jnp.uint32(0x9E3779B9)) ^ jnp.uint32(seed_hi)
        h = (h ^ (h >> 16)) * jnp.uint32(0x85EBCA6B)
        h = (h ^ (h >> 13)) * jnp.uint32(0xC2B2AE35)
        h = h ^ (h >> 16)
        pltpu.prng_seed(h, pid)
        w_ref[:] = pltpu.bitcast(pltpu.prng_random_bits((W, bb)), jnp.uint32)
        e_ref[:] = pltpu.bitcast(pltpu.prng_random_bits((2, bb)), jnp.uint32)

    return pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((W, batch), jnp.uint32),
            jax.ShapeDtypeStruct((2, batch), jnp.uint32),
        ],
        grid=(batch // bb,),
        in_specs=[pl.BlockSpec((W, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((W, bb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, bb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
    )(vm_c)


key_word = np.array([p // 32 for p in key_idx], np.int32)
key_bit = np.array([np.uint32(1) << (31 - p % 32) for p in key_idx], np.uint32)
mask_j = jnp.asarray(sk.mask)


@jax.jit
def reconstruct(words, extra, bits):
    """XLA mirror of the kernel's zero/one paths from the raw streams."""
    words = words & vm_c
    ones_words = words | mask_j[:, None]
    r = extra[0] % jnp.uint32(D)
    r_word = jnp.asarray(key_word)[r]
    r_bit = jnp.asarray(key_bit)[r]
    word_ids = jax.lax.broadcasted_iota(jnp.int32, words.shape, 0)
    onehot = jnp.where(word_ids == r_word[None, :], r_bit[None, :], jnp.uint32(0))
    mask_wo = mask_j[:, None] & ~onehot
    others = jnp.all((words & mask_wo) == mask_wo, axis=0)
    forced = jnp.where(others, jnp.uint32(0), extra[1] & jnp.uint32(1))[None, :]
    zero_words = (words & ~onehot) | (onehot * forced)
    is_one = (bits & jnp.uint32(1))[None, :] == jnp.uint32(1)
    return jnp.where(is_one, ones_words, zero_words)


bits0 = jnp.zeros((BATCH,), jnp.uint8)
prod = encrypt_bits_pallas(SEED, bits0, sk.indices, sk.mask, ctx.valid_mask, N, D,
                           block_b=BB)
w_s, e_s = streams(SEED, BATCH)
rec = reconstruct(w_s, e_s, bits0.astype(jnp.uint32))
fidelity = bool(jnp.array_equal(prod, rec))
print(f"clone fidelity (prod == reconstruction): {fidelity}")
assert fidelity, "clone kernel does not mirror production PRNG consumption"

# 1. chi-square of the forced index r over [0, D).
r_all = e_s[0] % jnp.uint32(D)
hist = np.asarray(jnp.bincount(r_all.astype(jnp.int32), length=D))
exp = BATCH / D
chi2 = float(((hist - exp) ** 2 / exp).sum())
# df=31: p=0.01 at 52.19, p=0.001 at 61.10
print(f"forced-index chi2 (df={D-1}): {chi2:.1f}  (thresholds: 52.2 @p=.01, 61.1 @p=.001)")
print("hist:", hist.tolist())
assert chi2 < 61.1, f"forced-index distribution biased: chi2={chi2:.1f}"

# 2. per-secret-position set-bit rate on zero-encryptions: ~N/2 each.
pos_counts = []
for p, (wd, bt) in enumerate(zip(key_word, key_bit)):
    cnt = int(jnp.sum((prod[int(wd)] & jnp.uint32(bt)) != 0))
    pos_counts.append(cnt)
pos_counts = np.array(pos_counts)
z = (pos_counts - BATCH / 2) / np.sqrt(BATCH * 0.25)
print(f"secret-position set-bit z-scores: min {z.min():.2f} max {z.max():.2f}")
print("counts:", pos_counts.tolist())
assert np.abs(z).max() < 5.0, "per-position bit bias beyond 5 sigma"

# 3. duplicate adjacent chunks (any hit = stream collision).
dups = int(jnp.sum(jnp.all(prod[:, 1:] == prod[:, :-1], axis=0)))
print(f"adjacent duplicate chunks: {dups}")
assert dups == 0

# 4. cross-seed shifted-block collision: seed S block b vs seed S+1 block b-1.
prod2 = encrypt_bits_pallas(SEED + 1, bits0, sk.indices, sk.mask, ctx.valid_mask,
                            N, D, block_b=BB)
a_blocks = prod[:, BB:]          # seed S, blocks 1..
b_blocks = prod2[:, :-BB]        # seed S+1, blocks 0..
coll = int(jnp.sum(jnp.all(a_blocks == b_blocks, axis=0)))
print(f"cross-seed shifted-block equal chunks: {coll}")
assert coll == 0

# Also chi-square within EACH of the first 8 blocks (seeding bias per block).
worst = 0.0
for blk in range(8):
    h = np.asarray(jnp.bincount(
        r_all[blk * BB:(blk + 1) * BB].astype(jnp.int32), length=D))
    e = BB / D
    c2 = float(((h - e) ** 2 / e).sum())
    worst = max(worst, c2)
print(f"per-block chi2 worst of 8 (df=31): {worst:.1f}")
assert worst < 61.1

print("ENC STATS OK")

