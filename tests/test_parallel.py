"""Multi-device SPMD tests on the 8-device virtual CPU mesh.

Same code path as real pods (SURVEY.md §4d): shard_map + XLA collectives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csgn_tpu.ops import core
from csgn_tpu.parallel import (
    chunk_mesh,
    sharded_decrypt_parity,
    sharded_encrypt_bits,
    sharded_mul_allgather,
    sharded_mul_ring,
)
from csgn_tpu.secret_key import SecretKey


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return chunk_mesh(8)


def _rand_words_wc(rng, chunks, ctx):
    w = rng.integers(0, 2**32, size=(ctx.words32, chunks), dtype=np.uint32)
    return jnp.asarray(w & ctx.valid_mask[:, None])


@pytest.mark.parametrize("t1,t2", [(8, 8), (16, 32), (64, 8)])
def test_sharded_mul_allgather_bit_exact(ctx, mesh, t1, t2):
    rng = np.random.default_rng(t1 + t2)
    a = _rand_words_wc(rng, t1, ctx)
    b = _rand_words_wc(rng, t2, ctx)
    got = sharded_mul_allgather(a, b, mesh)
    want = core.mul_chunks(a, b)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("t1,t2", [(8, 8), (16, 32), (64, 8)])
def test_sharded_mul_ring_bit_exact(ctx, mesh, t1, t2):
    rng = np.random.default_rng(t1 * 7 + t2)
    a = _rand_words_wc(rng, t1, ctx)
    b = _rand_words_wc(rng, t2, ctx)
    got = sharded_mul_ring(a, b, mesh)
    want = core.mul_chunks(a, b)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sharded_decrypt_matches(ctx, mesh):
    rng = np.random.default_rng(3)
    sk = SecretKey.generate(ctx, jax.random.key(1))
    mask = jnp.asarray(sk.mask)
    for chunks in [8, 64, 512]:
        words = _rand_words_wc(rng, chunks, ctx)
        got = sharded_decrypt_parity(words, mask, mesh)
        want = core.decrypt_parity(words, mask)
        assert int(got) == int(want), chunks


def test_sharded_decrypt_real_ciphertext(ctx, mesh):
    """End-to-end: encrypt batch -> multiply sharded -> decrypt sharded."""
    sk = SecretKey.generate(ctx, jax.random.key(0))
    bits = jnp.asarray([1, 0, 1, 1, 0, 1, 1, 1], dtype=jnp.uint8)
    words = sk.encrypt_batch(bits, jax.random.key(42))       # [W, 8]
    # Treat the batch as one 8-chunk ciphertext: Dec = parity of bits = 0.
    assert int(sharded_decrypt_parity(words, jnp.asarray(sk.mask), mesh)) == int(
        np.asarray(bits).sum() % 2
    )
    # Sharded square of it: Dec(c*c) = Dec(c)&Dec(c).
    prod = sharded_mul_allgather(words, words, mesh)
    assert prod.shape == (ctx.words32, 64)
    want = core.mul_chunks(words, words)
    np.testing.assert_array_equal(np.asarray(prod), np.asarray(want))
    assert int(sharded_decrypt_parity(prod, jnp.asarray(sk.mask), mesh)) == (
        int(np.asarray(bits).sum() % 2) & int(np.asarray(bits).sum() % 2)
    )


def test_sharded_encrypt_roundtrip(ctx, mesh):
    sk = SecretKey.generate(ctx, jax.random.key(5))
    bits = jnp.asarray(np.random.default_rng(9).integers(0, 2, 64), dtype=jnp.uint8)
    words = sharded_encrypt_bits(
        jax.random.key(7),
        bits,
        jnp.asarray(sk.indices),
        jnp.asarray(sk.mask),
        jnp.asarray(ctx.valid_mask),
        ctx.n,
        ctx.d,
        mesh,
    )
    assert words.shape == (ctx.words32, 64)
    dec = sk.decrypt_batch(words)
    np.testing.assert_array_equal(np.asarray(dec), np.asarray(bits))
    # Canonical form preserved.
    assert np.all(np.asarray(words) & ~ctx.valid_mask[:, None] == 0)


def test_indivisible_raises(ctx, mesh):
    rng = np.random.default_rng(1)
    a = _rand_words_wc(rng, 7, ctx)
    b = _rand_words_wc(rng, 8, ctx)
    with pytest.raises(ValueError):
        sharded_mul_allgather(a, b, mesh)
    with pytest.raises(ValueError):
        sharded_decrypt_parity(a, jnp.zeros(ctx.words32, jnp.uint32), mesh)


@pytest.mark.parametrize("t1,t2,fa,fb", [(8, 16, 3, 5), (16, 8, 1, 2), (32, 32, 0, 0)])
def test_sharded_mul_decrypt_fused(ctx, mesh, t1, t2, fa, fb):
    """Fused sharded multiply+decrypt == staged sharded ops == oracle,
    including odd*odd (parity 1) and zero-match cases."""
    from csgn_tpu.parallel import sharded_mul_decrypt

    rng = np.random.default_rng(t1 * 100 + t2)
    sk = SecretKey.generate(ctx, jax.random.key(5))
    mask = jnp.asarray(sk.mask)
    a_np = np.asarray(_rand_words_wc(rng, t1, ctx)).copy()
    b_np = np.asarray(_rand_words_wc(rng, t2, ctx)).copy()
    if fa:
        a_np[:, rng.choice(t1, fa, replace=False)] |= sk.mask[:, None]
    if fb:
        b_np[:, rng.choice(t2, fb, replace=False)] |= sk.mask[:, None]
    a, b = jnp.asarray(a_np), jnp.asarray(b_np)

    prod, parity = sharded_mul_decrypt(a, b, mask, mesh)
    want_prod = core.mul_chunks(a, b)
    np.testing.assert_array_equal(jax.device_get(prod), np.asarray(want_prod))
    assert int(parity) == (fa * fb) & 1 == int(core.decrypt_parity(want_prod, mask))

    staged = sharded_mul_allgather(a, b, mesh)
    assert int(parity) == int(sharded_decrypt_parity(staged, mask, mesh))
