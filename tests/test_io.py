"""Serialization / checkpoint round-trips, including reference-layout interop."""

import jax
import numpy as np

from csgn_tpu import Ciphertext, Permutation, SecretKey
from csgn_tpu import io as cio


def test_ciphertext_roundtrip(tmp_path, ctx, rng):
    keys = jax.random.split(rng, 3)
    sk = SecretKey.generate(ctx, keys[0])
    ct = (sk.encrypt(1, keys[1]) + sk.encrypt(0, keys[2])) * sk.encrypt(1, keys[1])
    path = tmp_path / "ct.npz"
    cio.save_ciphertext(path, ct)
    back = cio.load_ciphertext(path)
    assert back.ctx == ct.ctx
    np.testing.assert_array_equal(np.asarray(back.wt), np.asarray(ct.wt))
    assert int(sk.decrypt(back)) == int(sk.decrypt(ct))


def test_secret_key_roundtrip(tmp_path, ctx, rng):
    sk = SecretKey.generate(ctx, rng)
    path = tmp_path / "sk.npz"
    cio.save_secret_key(path, sk)
    back = cio.load_secret_key(path)
    assert back.ctx == sk.ctx
    np.testing.assert_array_equal(back.indices, sk.indices)
    np.testing.assert_array_equal(back.mask, sk.mask)


def test_permutation_roundtrip(tmp_path, ctx, rng):
    p = Permutation.random(ctx, rng)
    path = tmp_path / "p.npz"
    cio.save_permutation(path, p)
    assert cio.load_permutation(path) == p


def test_state_checkpoint_resume(tmp_path, small_ctx):
    """Checkpoint mid-computation, resume, and finish identically."""
    keys = jax.random.split(jax.random.key(3), 6)
    sk = SecretKey.generate(small_ctx, keys[0])
    p = Permutation.random(small_ctx, keys[1])
    acc = sk.encrypt(1, keys[2]) + sk.encrypt(0, keys[3])
    acc = acc * (sk.encrypt(1, keys[4]) + sk.encrypt(1, keys[5]))

    path = tmp_path / "state.npz"
    cio.save_state(path, {"acc": acc, "sk": sk, "perm": p})
    state = cio.load_state(path)

    # Resume: continue the chain from the checkpoint on both copies.
    fresh = sk.encrypt(1, keys[2])
    done_a = (acc * fresh).apply_permutation(p)
    done_b = (state["acc"] * fresh).apply_permutation(state["perm"])
    np.testing.assert_array_equal(np.asarray(done_a.wt), np.asarray(done_b.wt))
    assert int(state["sk"].apply_permutation(p).decrypt(done_b)) == int(
        sk.apply_permutation(p).decrypt(done_a)
    )


def test_reference_u64_interop(ctx, rng):
    """to_u64/from_u64 is a lossless bijection to the reference layout."""
    keys = jax.random.split(rng, 2)
    sk = SecretKey.generate(ctx, keys[0])
    ct = sk.encrypt(1, keys[1]) + sk.encrypt(0, keys[1])
    w64 = ct.to_u64()
    assert w64.shape == (2 * ctx.words64,)
    back = Ciphertext.from_u64(w64, ctx)
    np.testing.assert_array_equal(np.asarray(back.wt), np.asarray(ct.wt))
