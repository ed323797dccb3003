"""Permutation parity with reference tests/permutations.cpp — asserting."""

import jax
import numpy as np
import pytest

from csgn_tpu import Context, Permutation, Plaintext, SecretKey


def test_permutation_scenario(ctx, rng):
    """Dec_{π(k)}(π(E(1))) = 1 (reference tests/permutations.cpp:30-46)."""
    k_key, k_enc, k_perm = jax.random.split(rng, 3)
    seckey = SecretKey.generate(ctx, k_key)
    c1 = seckey.encrypt(Plaintext(1), k_enc)

    permutation = Permutation.random(ctx, k_perm)
    permuted_key = seckey.apply_permutation(permutation)
    permuted_ct = c1.apply_permutation(permutation)

    assert permuted_key.decrypt(permuted_ct) == Plaintext(1)
    # And the unpermuted key should *not* reliably decrypt... at minimum the
    # permuted pair must round-trip for bit 0 too.
    c0 = seckey.encrypt(Plaintext(0), k_enc)
    assert permuted_key.decrypt(c0.apply_permutation(permutation)) == Plaintext(0)


def test_inverse_and_composition(ctx, rng):
    """p + p.inverse() = identity (reference tests/permutations.cpp:49-53,
    exercised but never checked there — here we assert it)."""
    p = Permutation.random(ctx, rng)
    inv = p.inverse()
    assert (p + inv).is_identity()
    assert (inv + p).is_identity()
    # Composition is associative and matches index algebra (p+q)[i]=p[q[i]].
    q = Permutation.random(ctx, jax.random.key(123))
    pq = p + q
    i = np.arange(ctx.n)
    np.testing.assert_array_equal(pq.perm, p.perm[q.perm])


def test_permutation_equivariance_multichunk(small_ctx, rng):
    """π applied per chunk commutes with decrypt for multi-chunk ciphertexts.

    The reference is *wrong* here (it truncates to one chunk,
    src/Ciphertext.cpp:36-40; SURVEY.md §2b.2); we assert the correct
    semantics: Dec_{π(k)}(π(c)) = Dec_k(c) for any chunk count.
    """
    keys = jax.random.split(rng, 8)
    sk = SecretKey.generate(small_ctx, keys[0])
    c = (
        sk.encrypt(1, keys[1])
        + sk.encrypt(1, keys[2])
        + sk.encrypt(0, keys[3])
    ) * (sk.encrypt(1, keys[4]) + sk.encrypt(0, keys[5]))
    assert c.chunks == 6
    p = Permutation.random(small_ctx, keys[6])
    permuted = c.apply_permutation(p)
    assert permuted.chunks == 6       # no truncation, unlike the reference
    assert int(sk.apply_permutation(p).decrypt(permuted)) == int(sk.decrypt(c))


def test_permuted_key_positions(small_ctx, rng):
    """Permuted key = sorted π⁻¹[s] (reference re-extraction order,
    src/SecretKey.cpp:244-250)."""
    k1, k2 = jax.random.split(rng)
    sk = SecretKey.generate(small_ctx, k1)
    p = Permutation.random(small_ctx, k2)
    psk = sk.apply_permutation(p)
    # Forward check: key bit at position i of permuted key <=> π[i] in s.
    s = set(int(x) for x in sk.indices)
    expect = sorted(i for i in range(small_ctx.n) if int(p.perm[i]) in s)
    assert list(psk.indices) == expect


def test_composed_permutation_equals_sequential(small_ctx, rng):
    """Applying p then q to a ciphertext == applying (p + q)."""
    keys = jax.random.split(rng, 4)
    sk = SecretKey.generate(small_ctx, keys[0])
    c = sk.encrypt(1, keys[1])
    p = Permutation.random(small_ctx, keys[2])
    q = Permutation.random(small_ctx, keys[3])
    # out1[i] = (c after p)[q[i]] = c[p[q[i]]] = (p+q) applied once.
    seq = c.apply_permutation(p).apply_permutation(q)
    once = c.apply_permutation(p + q)
    np.testing.assert_array_equal(np.asarray(seq.wt), np.asarray(once.wt))


def test_length_mismatch_raises(ctx, small_ctx, rng):
    p_small = Permutation.random(small_ctx, rng)
    sk = SecretKey.generate(ctx, jax.random.key(1))
    with pytest.raises(ValueError):
        sk.apply_permutation(p_small)
    c = sk.encrypt(1, jax.random.key(2))
    with pytest.raises(ValueError):
        c.apply_permutation(p_small)
