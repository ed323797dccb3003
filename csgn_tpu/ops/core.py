"""Core homomorphic ops on packed chunk tensors — pure jnp reference versions.

These are the semantics oracles: every Pallas kernel in `csgn_tpu.ops.kernels`
must match them bit-exactly.  They are also fast in their own right — XLA
fuses the elementwise AND / popcount / reduce chains into single
bandwidth-bound passes — so they double as the fallback compute path on any
backend (CPU tests, interpret mode).

Shape conventions (see SURVEY.md §7):
  * a ciphertext is ``uint32[chunks, W]`` where ``W = ctx.words32``;
  * batched ciphertexts are ``uint32[batch, chunks, W]``;
  * a secret key is index form ``int32[d]`` plus packed **mask form**
    ``uint32[W]`` (indicator of the d secret bit positions), the kernel-facing
    representation: decrypt never unpacks bits, unlike the reference's
    byte-per-bit unpack (reference src/SecretKey.cpp:87-95,113-124).

Semantics parity (reference certfhe/CSGN):
  * add = chunk concatenation            (reference src/Ciphertext.cpp:107-122)
  * mul = chunk cross-product AND, output chunk index i*t2 + j
                                         (reference src/Ciphertext.cpp:153-163)
  * decrypt = per-chunk AND over the d secret positions, parity across chunks
                                         (reference src/SecretKey.cpp:126-140)
  * permutation: out bit i = in bit perm[i], applied **per chunk** (the
    mathematically correct extension; the reference truncates multi-chunk
    ciphertexts to one chunk — a bug, see SURVEY.md §2b.2 — and we deliberately
    diverge, matching it only on fresh single-chunk ciphertexts).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from csgn_tpu import layout

__all__ = [
    "add_chunks",
    "mul_chunks",
    "chunk_matches",
    "decrypt_parity",
    "permute_chunks",
    "encrypt_bits",
    "keygen",
]


# ---------------------------------------------------------------------------
# Homomorphic operators
# ---------------------------------------------------------------------------


def add_chunks(a: jax.Array, b: jax.Array) -> jax.Array:
    """Homomorphic add: concatenate chunk axes.  [ta,W] + [tb,W] -> [ta+tb,W]."""
    return jnp.concatenate([a, b], axis=-2)


def mul_chunks(a: jax.Array, b: jax.Array) -> jax.Array:
    """Homomorphic multiply: chunk cross-product AND.

    [t1,W] * [t2,W] -> [t1*t2, W] with output chunk index ``i*t2 + j``
    (i-major, matching reference src/Ciphertext.cpp:159).  Batched inputs
    broadcast over leading axes.
    """
    t1, t2 = a.shape[-2], b.shape[-2]
    out = a[..., :, None, :] & b[..., None, :, :]
    return out.reshape(*out.shape[:-3], t1 * t2, a.shape[-1])


# ---------------------------------------------------------------------------
# Decryption
# ---------------------------------------------------------------------------


def chunk_matches(words: jax.Array, mask: jax.Array, d: int) -> jax.Array:
    """Per-chunk decrypt bit: AND of the chunk's bits at the d secret positions.

    ``popcount(chunk & mask) == d``  <=>  all d secret positions are 1.
    words: uint32[..., chunks, W]; mask: uint32[W].  Returns uint32[..., chunks].
    """
    pc = jnp.sum(jax.lax.population_count(words & mask), axis=-1, dtype=jnp.uint32)
    return (pc == jnp.uint32(d)).astype(jnp.uint32)


def decrypt_parity(words: jax.Array, mask: jax.Array, d: int) -> jax.Array:
    """Decrypt: parity (sum mod 2) of per-chunk AND bits.

    Matches reference src/SecretKey.cpp:126-140 for any chunk count (the
    reference's single-chunk fast path src/SecretKey.cpp:82-102 is the same
    formula with one chunk).  Returns uint32[...] scalar per leading batch.
    """
    m = chunk_matches(words, mask, d)
    return jnp.sum(m, axis=-1, dtype=jnp.uint32) & jnp.uint32(1)


# ---------------------------------------------------------------------------
# Permutation
# ---------------------------------------------------------------------------


def permute_chunks(words: jax.Array, perm: jax.Array, n: int) -> jax.Array:
    """Apply bit-position permutation per chunk: out bit i = in bit perm[i].

    words: uint32[..., chunks, W] -> same shape.  Reference semantics
    (src/Ciphertext.cpp:33-34) on single-chunk inputs; correct per-chunk
    extension for multi-chunk ones.
    """
    bits = layout.unpack_bits(words, n)
    out = jnp.take(bits, perm, axis=-1)
    return layout.pack_bits(out)


# ---------------------------------------------------------------------------
# Key generation & encryption (native mode: threefry)
# ---------------------------------------------------------------------------


def keygen(rng: jax.Array, n: int, d: int) -> jax.Array:
    """Sample d distinct secret bit positions in [0, n).  Returns int32[d].

    The reference uses O(n*d) rejection sampling over C rand()
    (src/SecretKey.cpp:322-335); here we take the first d entries of a
    Fisher-Yates permutation — same distribution, O(n), counter-based.
    """
    return jax.random.permutation(rng, n)[:d].astype(jnp.int32)


def encrypt_bits(
    rng: jax.Array,
    bits: jax.Array,
    key_indices: jax.Array,
    mask: jax.Array,
    valid_mask: jax.Array,
    n: int,
    d: int,
) -> jax.Array:
    """Batched fresh encryption: bits uint[batch] -> uint32[batch, W].

    Encrypt invariant (reference src/SecretKey.cpp:35-80):
      * bit 1: all d secret positions are 1; other in-range bits uniform.
      * bit 0: pick a uniform secret index r; all other bits uniform; the bit
        at position s[r] is forced to 0 if the other d-1 secret bits are all 1,
        else uniform.  Net effect: AND over the d secret positions is 0.
    Out-of-range bits (position >= n) are always 0 (canonical form).
    """
    batch = bits.shape[0]
    w = mask.shape[-1]
    k_words, k_rbit, k_ridx = jax.random.split(rng, 3)

    words = jax.random.bits(k_words, (batch, w), dtype=jnp.uint32) & valid_mask

    # bit == 1 branch: force every secret position to 1.
    ones_words = words | mask

    # bit == 0 branch: force secret position s[r] to break the AND.
    r = jax.random.randint(k_ridx, (batch,), 0, d)
    r_pos = key_indices[r]                                   # int32[batch]
    r_word = r_pos // 32
    r_bit = jnp.uint32(1) << (jnp.uint32(31) - (r_pos % 32).astype(jnp.uint32))
    onehot = (
        jnp.zeros((batch, w), dtype=jnp.uint32)
        .at[jnp.arange(batch), r_word]
        .set(r_bit)
    )
    mask_wo = mask & ~onehot
    others_all_one = (
        jnp.sum(jax.lax.population_count(words & mask_wo), axis=-1, dtype=jnp.uint32)
        == jnp.uint32(d - 1)
    )
    rand_bit = jax.random.bits(k_rbit, (batch,), dtype=jnp.uint32) & jnp.uint32(1)
    forced_bit = jnp.where(others_all_one, jnp.uint32(0), rand_bit)
    zero_words = (words & ~onehot) | (onehot * forced_bit[:, None])

    is_one = (bits.astype(jnp.uint32) & jnp.uint32(1))[:, None].astype(bool)
    return jnp.where(is_one, ones_words, zero_words)
