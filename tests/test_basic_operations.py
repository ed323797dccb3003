"""End-to-end scenario parity with reference tests/basic_operations.cpp —
as seeded, asserting tests (the reference only prints; SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from csgn_tpu import Ciphertext, Context, Plaintext, SecretKey


def test_basic_operations_scenario(ctx, rng):
    """init -> Context(1247,16) -> keygen -> encrypt 0/1 -> add, mul -> decrypt."""
    k_key, k1, k0 = jax.random.split(rng, 3)
    seckey = SecretKey.generate(ctx, k_key)

    p1, p0 = Plaintext(1), Plaintext(0)
    c1 = seckey.encrypt(p1, k1)
    c0 = seckey.encrypt(p0, k0)
    assert c1.chunks == 1 and c0.chunks == 1

    added = c1 + c0
    multiplied = c1 * c0
    assert added.chunks == 2          # add concatenates (reference :107-122)
    assert multiplied.chunks == 1     # 1x1 cross product

    # Dec(E(1)+E(0)) = 1, Dec(E(1)*E(0)) = 0 (reference prints these).
    assert seckey.decrypt(added) == Plaintext(1)
    assert seckey.decrypt(multiplied) == Plaintext(0)
    # Round-trip of the fresh ciphertexts themselves.
    assert seckey.decrypt(c1) == Plaintext(1)
    assert seckey.decrypt(c0) == Plaintext(0)


def test_homomorphism_exhaustive_bits(ctx, rng):
    """Dec(E(a)+E(b)) = a^b and Dec(E(a)*E(b)) = a&b for all bit pairs."""
    keys = jax.random.split(rng, 6)
    seckey = SecretKey.generate(ctx, keys[0])
    for a in (0, 1):
        for b in (0, 1):
            ca = seckey.encrypt(a, keys[1 + a])
            cb = seckey.encrypt(b, keys[3 + b])
            assert int(seckey.decrypt(ca + cb)) == a ^ b, (a, b)
            assert int(seckey.decrypt(ca * cb)) == a & b, (a, b)


def test_multiply_chunk_growth_and_order(small_ctx, rng):
    """Multi-chunk multiply: t1 x t2 chunks, output index i*t2+j (i-major)."""
    keys = jax.random.split(rng, 8)
    sk = SecretKey.generate(small_ctx, keys[0])
    # Build a 2-chunk and a 3-chunk ciphertext via adds.
    a = sk.encrypt(1, keys[1]) + sk.encrypt(0, keys[2])
    b = sk.encrypt(1, keys[3]) + sk.encrypt(1, keys[4]) + sk.encrypt(0, keys[5])
    prod = a * b
    assert prod.chunks == 6
    # Chunk (i, j) of the product is a_i & b_j at flat index i*3 + j
    # (columns in the word-major layout).
    aw, bw = a.chunk_major(), b.chunk_major()
    pw = prod.chunk_major()
    for i in range(2):
        for j in range(3):
            np.testing.assert_array_equal(pw[i * 3 + j], aw[i] & bw[j])
    # Semantics: Dec(a)=1^0=1, Dec(b)=1^1^0=0, product decrypts to 0.
    assert int(sk.decrypt(prod)) == (int(sk.decrypt(a)) & int(sk.decrypt(b)))


def test_deep_mult_chain(small_ctx, rng):
    """8-deep sequential multiply chain with chunk growth (BASELINE config)."""
    keys = jax.random.split(rng, 12)
    sk = SecretKey.generate(small_ctx, keys[0])
    acc = sk.encrypt(1, keys[1]) + sk.encrypt(0, keys[2])   # 2 chunks, Dec=1
    expect = 1
    for step in range(1, 8):
        bit = step % 2
        fresh = sk.encrypt(bit, keys[2 + step])
        acc = acc * (fresh + sk.encrypt(0, keys[3 + step]))  # 2-chunk operand
        expect &= bit ^ 0
    assert acc.chunks == 2 ** 8
    assert int(sk.decrypt(acc)) == expect


def test_batched_encrypt_decrypt(ctx, rng):
    k_key, k_enc = jax.random.split(rng)
    sk = SecretKey.generate(ctx, k_key)
    bits = jnp.asarray(np.random.default_rng(5).integers(0, 2, 256), dtype=jnp.uint8)
    words = sk.encrypt_batch(bits, k_enc)
    assert words.shape == (ctx.words32, 256)
    assert words.dtype == jnp.uint32
    # Decrypt as batch of single-chunk ciphertexts.
    dec = sk.decrypt_batch(words)
    np.testing.assert_array_equal(np.asarray(dec), np.asarray(bits))
    # Canonical form: no bits outside [0, n).
    assert np.all(np.asarray(words) & ~ctx.valid_mask[:, None] == 0)


def test_encrypt_zero_invariant(ctx, rng):
    """For bit 0, the AND over secret positions must be 0 but bits still look
    random; for bit 1 all secret positions are 1."""
    k_key, k_enc = jax.random.split(rng)
    sk = SecretKey.generate(ctx, k_key)
    bits = jnp.asarray([0] * 64 + [1] * 64, dtype=jnp.uint8)
    words = np.asarray(sk.encrypt_batch(bits, k_enc)).T   # [batch, W]
    mask = sk.mask
    popc = np.array([sum(int(x).bit_count() for x in (w & mask)) for w in words])
    assert np.all(popc[:64] < ctx.d)      # bit 0: not all secret positions set
    assert np.all(popc[64:] == ctx.d)     # bit 1: all secret positions set


def test_context_mismatch_raises(ctx, small_ctx, rng):
    import pytest

    k = jax.random.split(rng, 4)
    sk1 = SecretKey.generate(ctx, k[0])
    sk2 = SecretKey.generate(small_ctx, k[1])
    c1 = sk1.encrypt(1, k[2])
    c2 = sk2.encrypt(1, k[3])
    with pytest.raises(ValueError):
        _ = c1 + c2
    with pytest.raises(ValueError):
        _ = c1 * c2
