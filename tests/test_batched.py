"""Batched multi-chunk ops: [B, W, C] arrays under vmap / broadcasting."""

import jax
import jax.numpy as jnp
import numpy as np

from csgn_tpu import SecretKey
from csgn_tpu.ops import core


def _rand_batch(rng, b, chunks, ctx):
    w = rng.integers(0, 2**32, size=(b, ctx.words32, chunks), dtype=np.uint32)
    return jnp.asarray(w & ctx.valid_mask[None, :, None])


def test_batched_mul_matches_per_element(ctx):
    rng = np.random.default_rng(0)
    a = _rand_batch(rng, 4, 3, ctx)
    b = _rand_batch(rng, 4, 5, ctx)
    out = core.mul_chunks(a, b)          # broadcasting over leading axis
    assert out.shape == (4, ctx.words32, 15)
    for i in range(4):
        np.testing.assert_array_equal(
            np.asarray(out[i]), np.asarray(core.mul_chunks(a[i], b[i]))
        )


def test_batched_decrypt_matches_per_element(ctx):
    rng = np.random.default_rng(1)
    words = _rand_batch(rng, 6, 7, ctx)
    sk = SecretKey.generate(ctx, jax.random.key(5))
    mask = jnp.asarray(sk.mask)
    out = core.decrypt_parity(words, mask)
    assert out.shape == (6,)
    for i in range(6):
        assert int(out[i]) == int(core.decrypt_parity(words[i], mask))


def test_vmapped_pipeline(ctx):
    """vmap over an encrypt->square->decrypt pipeline of independent elements."""
    sk = SecretKey.generate(ctx, jax.random.key(0))
    bits = jnp.asarray([0, 1, 1, 0, 1, 0, 1, 1], dtype=jnp.uint8)
    words = sk.encrypt_batch(bits, jax.random.key(1))    # [W, B]
    per_elem = words.T[:, :, None]                       # [B, W, 1]
    mask = jnp.asarray(sk.mask)

    def square_dec(wt):
        return core.decrypt_parity(core.mul_chunks(wt, wt), mask)

    out = jax.vmap(square_dec)(per_elem)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))


def test_batched_permute(ctx):
    rng = np.random.default_rng(2)
    words = _rand_batch(rng, 3, 4, ctx)
    perm = jnp.asarray(np.random.default_rng(3).permutation(ctx.n).astype(np.int32))
    out = core.permute_chunks(words, perm, ctx.n)
    assert out.shape == words.shape
    for i in range(3):
        np.testing.assert_array_equal(
            np.asarray(out[i]), np.asarray(core.permute_chunks(words[i], perm, ctx.n))
        )


def test_recrypt_resets_growth(small_ctx):
    keys = jax.random.split(jax.random.key(7), 6)
    sk = SecretKey.generate(small_ctx, keys[0])
    big = (sk.encrypt(1, keys[1]) + sk.encrypt(0, keys[2])) * (
        sk.encrypt(1, keys[3]) + sk.encrypt(0, keys[4])
    )
    assert big.chunks == 4
    fresh = sk.recrypt(big, keys[5])
    assert fresh.chunks == 1
    assert int(sk.decrypt(fresh)) == int(sk.decrypt(big)) == 1
