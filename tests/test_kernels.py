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


# -- fused multiply + decrypt -------------------------------------------------


def _mask_and_forced(rng, ctx, words, n_force):
    """OR the key mask into `n_force` random columns so matches exist (a
    random chunk matches a d-bit mask with prob 2^-d — never, statistically)."""
    sk = SecretKey.generate(ctx, jax.random.key(int(rng.integers(1 << 30))))
    mask = sk.mask
    w_np = np.asarray(words).copy()
    cols = rng.choice(w_np.shape[1], size=min(n_force, w_np.shape[1]), replace=False)
    w_np[:, cols] |= mask[:, None]
    return jnp.asarray(w_np), jnp.asarray(mask)


@pytest.mark.parametrize("t1,t2,fa,fb", [(4, 128, 1, 3), (5, 128, 3, 5), (8, 256, 2, 3), (3, 384, 3, 128)])
def test_mul_decrypt_flat_matches_staged(ctx, t1, t2, fa, fb):
    """Fused flat kernel: product bit-exact AND parity == staged oracle,
    including odd*odd (parity 1), odd*even (parity 0), and the unaligned-t1
    padding path (padded a-columns must not count)."""
    rng = np.random.default_rng(t1 * 1000 + t2)
    a, mask = _mask_and_forced(rng, ctx, _rand_words_wc(rng, t1, ctx), fa)
    b, _ = _mask_and_forced(rng, ctx, _rand_words_wc(rng, t2, ctx), 0)
    b_np = np.asarray(b).copy()
    b_np[:, rng.choice(t2, size=fb, replace=False)] |= np.asarray(mask)[:, None]
    b = jnp.asarray(b_np)

    prod, parity = kernels.mul_decrypt_pallas(a, b, mask)
    want = core.mul_chunks(a, b)
    np.testing.assert_array_equal(np.asarray(prod), np.asarray(want))
    assert int(parity) == int(core.decrypt_parity(want, mask))


@pytest.mark.parametrize("t1,t2,fa,fb", [(4, 256, 1, 1), (7, 128, 5, 3)])
def test_mul_decrypt_tiled_matches_staged(ctx, t1, t2, fa, fb):
    rng = np.random.default_rng(t1 * 77 + t2)
    a, mask = _mask_and_forced(rng, ctx, _rand_words_wc(rng, t1, ctx), fa)
    b_np = np.asarray(_rand_words_wc(rng, t2, ctx)).copy()
    b_np[:, rng.choice(t2, size=fb, replace=False)] |= np.asarray(mask)[:, None]
    b = jnp.asarray(b_np)

    prod, parity = kernels.mul_decrypt_pallas_tiled(a, b, mask)
    want = core.mul_chunks(a, b)
    np.testing.assert_array_equal(np.asarray(prod), np.asarray(want))
    assert int(parity) == int(core.decrypt_parity(want, mask))


def test_mul_decrypt_dispatch_and_secret_key(ctx):
    """dispatch.mul_decrypt staged fallback + SecretKey.mul_and_decrypt
    end-to-end on real ciphertexts (Dec(E(1)*E(1)) = 1, Dec(E(1)*E(0)) = 0)."""
    keys = jax.random.split(jax.random.key(42), 4)
    sk = SecretKey.generate(ctx, keys[0])
    c1 = sk.encrypt(1, keys[1])
    c0 = sk.encrypt(0, keys[2])
    big1 = c1
    for _ in range(5):
        big1 = big1 + c1  # 6 chunks of E(1)-parity... (concat: parity XOR)

    prod, parity = dispatch.mul_decrypt(c1.wt, c0.wt, jnp.asarray(sk.mask))
    np.testing.assert_array_equal(np.asarray(prod), np.asarray(core.mul_chunks(c1.wt, c0.wt)))
    assert int(parity) == 0

    p11, d11 = sk.mul_and_decrypt(c1, c1)
    assert int(d11) == 1 and int(sk.decrypt(p11)) == 1
    p10, d10 = sk.mul_and_decrypt(c1, c0)
    assert int(d10) == 0 and int(sk.decrypt(p10)) == 0
    pb, db = sk.mul_and_decrypt(big1, c1)
    assert int(db) == int(sk.decrypt(big1)) & 1


def test_mul_and_decrypt_lazy_order_inputs(ctx):
    """Fused product of tag-carrying inputs: combined tag canonicalizes to the
    oracle product of the canonical inputs; parity is order-independent."""
    from csgn_tpu.ciphertext import Ciphertext

    rng = np.random.default_rng(11)
    t1, t2 = 6, 4
    sk = SecretKey.generate(ctx, jax.random.key(3))
    a_np = np.asarray(_rand_words_wc(rng, t1, ctx)).copy()
    a_np[:, :3] |= sk.mask[:, None]
    # physical order = reversed canonical order
    tag = jnp.asarray(np.arange(t1)[::-1].copy(), dtype=jnp.int32)
    ca = Ciphertext(jnp.asarray(a_np), ctx, tag)
    cb = Ciphertext(_rand_words_wc(rng, t2, ctx) | jnp.asarray(sk.mask)[:, None], ctx)

    prod, parity = sk.mul_and_decrypt(ca, cb)
    want = core.mul_chunks(np.asarray(ca.canonical().wt), np.asarray(cb.wt))
    np.testing.assert_array_equal(prod.chunk_major().T, np.asarray(want))
    assert int(parity) == int(core.decrypt_parity(jnp.asarray(want), jnp.asarray(sk.mask)))


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
