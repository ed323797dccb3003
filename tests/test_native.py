"""Differential tests: native C++ oracle vs Python/JAX implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csgn_tpu import Ciphertext, Permutation, SecretKey
from csgn_tpu import refcompat
from csgn_tpu.native import binding
from csgn_tpu.ops import core
from csgn_tpu.rng import GlibcRand


def test_native_rand_matches_python():
    for seed in [1, 42, 424242]:
        nr = binding.NativeRand(seed)
        pr = GlibcRand(seed)
        for _ in range(2000):
            assert nr.rand() == pr.rand()


def test_native_ref_encrypt_matches_refcompat(small_ctx):
    key = np.array([5, 20, 33, 80], dtype=np.int32)
    for seed, bit in [(1001, 1), (2002, 0), (77, 1), (78, 0)]:
        got = binding.NativeRand(seed).ref_encrypt(bit, key, small_ctx.n)
        want = refcompat.ref_encrypt_words(GlibcRand(seed), bit, key, small_ctx)
        np.testing.assert_array_equal(got, want, err_msg=f"seed={seed} bit={bit}")


def test_native_ref_permutation_matches_refcompat(small_ctx):
    for seed in [3003, 11]:
        got = binding.NativeRand(seed).ref_permutation(small_ctx.n)
        want = refcompat.ref_permutation(GlibcRand(seed), small_ctx.n)
        np.testing.assert_array_equal(got, want)


def test_native_mul_decrypt_permute_vs_jax(ctx):
    rng = np.random.default_rng(0)
    t1, t2 = 6, 5
    a_cm = rng.integers(0, 2**32, (t1, ctx.words32), dtype=np.uint32) & ctx.valid_mask
    b_cm = rng.integers(0, 2**32, (t2, ctx.words32), dtype=np.uint32) & ctx.valid_mask

    # multiply
    native_out = binding.mul(a_cm, b_cm)
    jax_out = core.mul_chunks(jnp.asarray(a_cm.T), jnp.asarray(b_cm.T))
    np.testing.assert_array_equal(native_out, np.asarray(jax_out).T)

    # decrypt
    sk = SecretKey.generate(ctx, jax.random.key(2))
    assert binding.decrypt(native_out, sk.mask) == int(
        core.decrypt_parity(jax_out, jnp.asarray(sk.mask))
    )

    # permute
    p = Permutation.random(ctx, jax.random.key(3))
    native_perm = binding.permute(a_cm, p.perm, ctx.n)
    jax_perm = core.permute_chunks(jnp.asarray(a_cm.T), jnp.asarray(p.perm), ctx.n)
    np.testing.assert_array_equal(native_perm, np.asarray(jax_perm).T)


def test_native_golden_encrypt(ctx):
    """Native codec reproduces a reference-dumped golden ciphertext."""
    import json
    import pathlib

    data = json.loads(
        (pathlib.Path(__file__).parent / "golden" / "golden_vectors.json").read_text()
    )
    sc = data["scenarios"][0]
    key = np.array(sc["key"], dtype=np.int32)
    got = binding.NativeRand(sc["seed1"]).ref_encrypt(1, key, sc["n"])
    from csgn_tpu.context import Context

    golden = Ciphertext.from_u64(
        np.array([int(x) for x in sc["c1"]], dtype=np.uint64), Context(sc["n"], sc["d"])
    )
    np.testing.assert_array_equal(got[None], golden.chunk_major())
