"""2-D (batch x chunk) mesh: sharded CiphertextBatch ops vs the vmapped
single-device oracle, bit-exact on the 8-device virtual mesh (BASELINE
config 4 at pod scale)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csgn_tpu.ops import core
from csgn_tpu.parallel import (
    batch_chunk_mesh,
    shard_batch,
    sharded_decrypt_batch,
    sharded_mul_batch,
    sharded_permute_batch,
)
from csgn_tpu.permutation import Permutation
from csgn_tpu.secret_key import SecretKey


def _rand_batch(rng, b, chunks, ctx):
    w = rng.integers(0, 2**32, size=(b, ctx.words32, chunks), dtype=np.uint32)
    return jnp.asarray(w & ctx.valid_mask[None, :, None])


@pytest.mark.parametrize("bd,cd", [(4, 2), (2, 4), (8, 1), (1, 8)])
def test_sharded_mul_batch_matches_oracle(ctx, bd, cd):
    rng = np.random.default_rng(bd * 10 + cd)
    mesh = batch_chunk_mesh(bd, cd)
    b, t1, t2 = 8, 8, 16
    a = shard_batch(_rand_batch(rng, b, t1, ctx), mesh)
    bb = shard_batch(_rand_batch(rng, b, t2, ctx), mesh)
    got = sharded_mul_batch(a, bb, mesh)
    want = core.mul_chunks(jax.device_get(a), jax.device_get(bb))
    np.testing.assert_array_equal(jax.device_get(got), np.asarray(want))


def test_sharded_decrypt_batch_matches_oracle(ctx):
    rng = np.random.default_rng(9)
    mesh = batch_chunk_mesh(4, 2)
    sk = SecretKey.generate(ctx, jax.random.key(0))
    mask = jnp.asarray(sk.mask)
    b, chunks = 8, 32
    w_np = np.asarray(_rand_batch(rng, b, chunks, ctx)).copy()
    # Force known match counts so parities differ across elements.
    for i in range(b):
        cols = rng.choice(chunks, size=i % 4, replace=False)
        w_np[i][:, cols] |= sk.mask[:, None]
    words = shard_batch(jnp.asarray(w_np), mesh)
    got = jax.device_get(sharded_decrypt_batch(words, mask, mesh))
    want = np.asarray(core.decrypt_parity(jnp.asarray(w_np), mask))
    np.testing.assert_array_equal(got, want)
    assert got.min() == 0 and got.max() == 1  # both parities exercised


def test_sharded_permute_batch_matches_oracle(ctx):
    rng = np.random.default_rng(21)
    mesh = batch_chunk_mesh(2, 4)
    perm = Permutation.random(ctx, jax.random.key(2))
    b, chunks = 4, 16
    words = shard_batch(_rand_batch(rng, b, chunks, ctx), mesh)
    got = jax.device_get(sharded_permute_batch(words, perm.benes_plan(), mesh))
    want = np.asarray(core.permute_chunks(jax.device_get(words), jnp.asarray(perm.perm), ctx.n))
    np.testing.assert_array_equal(got, want)


def test_batch_pipeline_2d_mesh(ctx):
    """encrypt -> stack -> sharded mul -> sharded permute -> sharded decrypt,
    end to end on the 4x2 mesh, checked against the key."""
    rng = np.random.default_rng(3)
    mesh = batch_chunk_mesh(4, 2)
    sk = SecretKey.generate(ctx, jax.random.key(7))
    b = 8
    bits1 = jnp.asarray(rng.integers(0, 2, b, dtype=np.uint8))
    bits2 = jnp.asarray(rng.integers(0, 2, b, dtype=np.uint8))
    # Fresh batches [W, B] -> [B, W, 1] -> grow to 2 chunks by concat.
    w1 = jnp.transpose(sk.encrypt_batch(bits1, jax.random.key(8)), (1, 0))[:, :, None]
    w2 = jnp.transpose(sk.encrypt_batch(bits2, jax.random.key(9)), (1, 0))[:, :, None]
    a = shard_batch(jnp.concatenate([w1, w2], axis=-1), mesh)   # [B, W, 2]
    prod = sharded_mul_batch(a, a, mesh)                        # [B, W, 4]
    perm = Permutation.random(ctx, jax.random.key(10))
    permuted = sharded_permute_batch(prod, perm.benes_plan(), mesh)
    psk = sk.apply_permutation(perm)
    got = jax.device_get(sharded_decrypt_batch(permuted, jnp.asarray(psk.mask), mesh))
    want = (np.asarray(bits1) ^ np.asarray(bits2))  # (b1+b2)^2 = b1 XOR b2 under GF(2)
    np.testing.assert_array_equal(got, want & 1)
