"""Mesh-invariant encryption + product-decrypt shortcut + n%64==0 contexts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csgn_tpu import Context, Permutation, SecretKey
from csgn_tpu.parallel import chunk_mesh, sharded_encrypt_bits_invariant


def test_encrypt_invariant_across_mesh_sizes(ctx):
    """Partitionable threefry: sharded output == single-device output."""
    sk = SecretKey.generate(ctx, jax.random.key(0))
    bits = jnp.asarray(np.arange(32) % 2, dtype=jnp.uint8)
    rng = jax.random.key(9)

    single = sk.encrypt_batch(bits, rng)
    for nd in [2, 8]:
        mesh = chunk_mesh(nd)
        sharded = sharded_encrypt_bits_invariant(
            rng, bits,
            jnp.asarray(sk.indices), jnp.asarray(sk.mask),
            jnp.asarray(ctx.valid_mask), ctx.n, ctx.d, mesh,
        )
        np.testing.assert_array_equal(np.asarray(sharded), np.asarray(single), err_msg=str(nd))


def test_decrypt_product_shortcut(small_ctx):
    keys = jax.random.split(jax.random.key(1), 8)
    sk = SecretKey.generate(small_ctx, keys[0])
    cts = [
        sk.encrypt(1, keys[1]) + sk.encrypt(0, keys[2]),   # Dec = 1
        sk.encrypt(1, keys[3]),                             # Dec = 1
        sk.encrypt(1, keys[4]) + sk.encrypt(1, keys[5]),    # Dec = 0
    ]
    from csgn_tpu.pipeline import mul_chain

    assert int(sk.decrypt_product(cts)) == int(sk.decrypt(mul_chain(cts))) == 0
    assert int(sk.decrypt_product(cts[:2])) == 1


def test_n_multiple_of_64_context():
    """n % 64 == 0 works here; the reference heap-overflows on it
    (SURVEY.md §2b: _bitlen[div] write past the array when rem == 0)."""
    ctx = Context(128, 8)
    assert ctx.words64 == 2 and ctx.words32 == 4
    assert ctx.bitlen == (64, 64)
    assert np.all(ctx.valid_mask == np.uint32(0xFFFFFFFF))

    keys = jax.random.split(jax.random.key(2), 6)
    sk = SecretKey.generate(ctx, keys[0])
    c1, c0 = sk.encrypt(1, keys[1]), sk.encrypt(0, keys[2])
    assert int(sk.decrypt(c1 + c0)) == 1
    assert int(sk.decrypt(c1 * c0)) == 0
    p = Permutation.random(ctx, keys[3])
    assert int(sk.apply_permutation(p).decrypt(c1.apply_permutation(p))) == 1
