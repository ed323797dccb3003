"""First-class batched ciphertexts [B, W, C]: every op must be bit-exact to a
loop of single-ciphertext ops (reference workload analogue tests/timings.cpp:26-42)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csgn_tpu import Ciphertext, CiphertextBatch, Permutation, SecretKey
from csgn_tpu.ops import dispatch


@pytest.fixture
def setup(small_ctx, rng):
    sk = SecretKey.generate(small_ctx, rng)
    bits = jnp.asarray(np.arange(6) % 2, dtype=jnp.uint8)
    fresh = sk.encrypt_batch(bits, rng)          # [W, 6]
    cb = CiphertextBatch.from_fresh(fresh, small_ctx)
    return sk, bits, fresh, cb


def test_from_fresh_roundtrip(setup, small_ctx):
    sk, bits, fresh, cb = setup
    assert cb.batch == 6 and cb.chunks == 1
    assert np.array_equal(np.asarray(cb.to_fresh()), np.asarray(fresh))
    assert np.array_equal(np.asarray(sk.decrypt_batch(cb)), np.asarray(bits))


def test_fresh_mul_fast_path_matches_loop(setup):
    sk, bits, fresh, cb = setup
    prod = cb * cb
    assert prod.chunks == 1
    for i in range(cb.batch):
        single = cb[i] * cb[i]
        assert np.array_equal(np.asarray(prod[i].canonical().wt),
                              np.asarray(single.canonical().wt))
    assert np.array_equal(np.asarray(sk.decrypt_batch(prod)), np.asarray(bits))


def test_batched_ops_match_single_loop(setup):
    sk, bits, fresh, cb = setup
    grown = cb + (cb * cb) + cb        # 3 chunks each
    prod = grown * grown               # 9 chunks each
    exp_bits = np.asarray(bits) ^ (np.asarray(bits) & np.asarray(bits)) ^ np.asarray(bits)
    exp_bits = exp_bits & exp_bits
    for i in range(cb.batch):
        g = cb[i] + (cb[i] * cb[i]) + cb[i]
        s = g * g
        assert np.array_equal(np.asarray(prod[i].canonical().wt),
                              np.asarray(s.canonical().wt)), f"element {i}"
    assert np.array_equal(np.asarray(sk.decrypt_batch(prod)), exp_bits)


def test_batched_permutation_matches_loop(setup, small_ctx, rng):
    sk, bits, fresh, cb = setup
    p = Permutation.random(small_ctx, jax.random.fold_in(rng, 3))
    grown = cb + cb
    pb = grown.apply_permutation(p)
    for i in range(cb.batch):
        want = (cb[i] + cb[i]).apply_permutation(p)
        assert np.array_equal(np.asarray(pb[i].canonical().wt),
                              np.asarray(want.canonical().wt))
    psk = sk.apply_permutation(p)
    assert np.array_equal(np.asarray(psk.decrypt_batch(pb)),
                          np.asarray(bits) ^ np.asarray(bits))


def test_stack_and_getitem(small_ctx, rng):
    sk = SecretKey.generate(small_ctx, rng)
    cts = [sk.encrypt(i % 2, jax.random.fold_in(rng, i)) for i in range(4)]
    cb = CiphertextBatch.stack(cts)
    assert cb.batch == 4
    for i, ct in enumerate(cts):
        assert np.array_equal(np.asarray(cb[i].wt), np.asarray(ct.wt))
        assert isinstance(cb[i], Ciphertext)
    grown = [ct + ct for ct in cts]
    cb2 = CiphertextBatch.stack(grown)
    assert cb2.chunks == 2


def test_to_u64_matches_per_element(setup):
    sk, bits, fresh, cb = setup
    grown = (cb + cb) * cb
    u = grown.to_u64()
    for i in range(cb.batch):
        want = ((cb[i] + cb[i]) * cb[i]).to_u64()
        assert np.array_equal(u[i], want)


def test_batched_jmajor_kernel_path(setup, monkeypatch):
    """Force the vmapped j-major path and check the shared tag resolves."""
    sk, bits, fresh, cb = setup

    def forced(a, b):
        t2 = b.shape[-1]
        out = jnp.concatenate([a & b[..., :, j:j+1] for j in range(t2)], axis=-1)
        return out, True, 0, 0

    monkeypatch.setattr(dispatch, "mul_chunks_batched", forced)
    grown = cb + cb + cb
    prod = grown * grown                    # j-major physical order
    assert not prod.is_canonical
    for i in range(cb.batch):
        want = ((cb[i] + cb[i]) + cb[i]) * ((cb[i] + cb[i]) + cb[i])
        assert np.array_equal(np.asarray(prod[i].canonical().wt),
                              np.asarray(want.canonical().wt))


def test_errors(setup, small_ctx):
    sk, bits, fresh, cb = setup
    with pytest.raises(ValueError, match=r"\[B, W, chunks\]"):
        CiphertextBatch(fresh, small_ctx)
    with pytest.raises(TypeError, match="CiphertextBatch"):
        cb + cb[0]
    with pytest.raises(ValueError, match="batch mismatch"):
        cb * CiphertextBatch(cb.wt[:2], small_ctx)
    with pytest.raises(ValueError, match="not a fresh batch"):
        (cb + cb).to_fresh()


def test_mul_and_decrypt_batch_fused(ctx):
    """Batched fused mul+decrypt == staged batch multiply then decrypt."""
    import jax

    from csgn_tpu.batch import CiphertextBatch
    from csgn_tpu.secret_key import SecretKey

    rng = np.random.default_rng(31)
    sk = SecretKey.generate(ctx, jax.random.key(1))
    b = 6
    bits1 = jnp.asarray(rng.integers(0, 2, b, dtype=np.uint8))
    bits2 = jnp.asarray(rng.integers(0, 2, b, dtype=np.uint8))
    w1 = jnp.transpose(sk.encrypt_batch(bits1, jax.random.key(2)), (1, 0))[:, :, None]
    w2 = jnp.transpose(sk.encrypt_batch(bits2, jax.random.key(3)), (1, 0))[:, :, None]
    cb1 = CiphertextBatch(jnp.concatenate([w1, w1], axis=-1), ctx)  # 2 chunks: parity 0
    cb2 = CiphertextBatch(jnp.concatenate([w2, w1], axis=-1), ctx)  # b2 ^ b1

    prod, got_bits = sk.mul_and_decrypt_batch(cb1, cb2)
    staged = cb1 * cb2
    want_bits = sk.decrypt_batch(staged)
    np.testing.assert_array_equal(
        np.asarray(prod.canonical().wt), np.asarray(staged.canonical().wt)
    )
    np.testing.assert_array_equal(np.asarray(got_bits), np.asarray(want_bits))
    # semantics: Dec(cb1)=0 element-wise, so every product decrypts to 0
    np.testing.assert_array_equal(np.asarray(got_bits), np.zeros(b, np.uint32))
