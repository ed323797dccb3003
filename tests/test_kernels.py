"""Pallas kernels must match the jnp oracles bit-exactly (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csgn_tpu.ops import core, dispatch, kernels
from csgn_tpu.secret_key import SecretKey


def _rand_words_wc(rng, chunks, ctx):
    w = rng.integers(0, 2**32, size=(ctx.words32, chunks), dtype=np.uint32)
    return jnp.asarray(w & ctx.valid_mask[:, None])


@pytest.mark.parametrize("t1,t2", [(1, 1), (2, 3), (8, 16), (13, 7), (9, 33)])
def test_mul_kernel_matches_oracle(ctx, t1, t2):
    rng = np.random.default_rng(t1 * 100 + t2)
    a = _rand_words_wc(rng, t1, ctx)
    b = _rand_words_wc(rng, t2, ctx)
    got = kernels.mul_chunks_pallas(a, b)
    want = core.mul_chunks(a, b)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("chunks", [1, 2, 19, 512, 1025])
def test_decrypt_kernel_matches_oracle(ctx, chunks):
    rng = np.random.default_rng(chunks)
    words = _rand_words_wc(rng, chunks, ctx)
    sk = SecretKey.generate(ctx, jax.random.key(chunks))
    mask = jnp.asarray(sk.mask)
    got = kernels.decrypt_parity_pallas(words, mask)
    want = core.decrypt_parity(words, mask)
    assert int(got) == int(want)


def test_decrypt_kernel_on_real_ciphertexts(ctx):
    keys = jax.random.split(jax.random.key(0), 4)
    sk = SecretKey.generate(ctx, keys[0])
    c = sk.encrypt(1, keys[1]) + sk.encrypt(0, keys[2]) + sk.encrypt(1, keys[3])
    got = kernels.decrypt_parity_pallas(c.wt, jnp.asarray(sk.mask))
    assert int(got) == 0  # 1 ^ 0 ^ 1


def test_dispatch_matches_core(ctx):
    rng = np.random.default_rng(0)
    a = _rand_words_wc(rng, 5, ctx)
    b = _rand_words_wc(rng, 4, ctx)
    np.testing.assert_array_equal(
        np.asarray(dispatch.mul_chunks(a, b)), np.asarray(core.mul_chunks(a, b))
    )
    sk = SecretKey.generate(ctx, jax.random.key(9))
    m = jnp.asarray(sk.mask)
    assert int(dispatch.decrypt_parity(a, m)) == int(core.decrypt_parity(a, m))


def test_pallas_mul_inside_shard_map(ctx):
    """Pallas kernels must trace inside shard_map bodies (vma propagation):
    the sharded multiply routes per-device blocks through them on TPU."""
    import jax
    from jax.sharding import PartitionSpec as P

    from csgn_tpu.ops import kernels
    from csgn_tpu.parallel.mesh import chunk_mesh

    rng = np.random.default_rng(5)
    w = ctx.words32
    a = jnp.asarray(rng.integers(0, 2**32, (w, 32), dtype=np.uint32) & ctx.valid_mask[:, None])
    b = jnp.asarray(rng.integers(0, 2**32, (w, 128), dtype=np.uint32) & ctx.valid_mask[:, None])
    mesh = chunk_mesh(8)

    def local_fn(a_blk, b_blk):
        b_full = jax.lax.all_gather(b_blk, "c", axis=1, tiled=True)
        return kernels.mul_chunks_pallas(a_blk, b_full)

    out = jax.shard_map(
        local_fn, mesh=mesh, in_specs=(P(None, "c"), P(None, "c")),
        out_specs=P(None, "c"), check_vma=False,
    )(a, b)
    assert np.array_equal(np.asarray(out), np.asarray(core.mul_chunks(a, b)))
