"""Fused multiply+decrypt over the FULL dispatch envelope (round-4 headliner).

The reference pipeline (multiply src/Ciphertext.cpp:153-163 then decrypt
src/SecretKey.cpp:104-147) serves every chunk count through one code path;
`ops.dispatch.mul_decrypt_auto` must too — canonical, swapped j-major, ragged
(zero-padded) and staged kernels all bit-exact to the staged oracle.  CPU
tests run the Pallas kernels in interpret mode and force each route via
monkeypatch (the TPU dispatch picks them automatically); the real-Mosaic
sweep lives in tools/tpu_validate.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csgn_tpu.ciphertext import Ciphertext, set_eager_order
from csgn_tpu.ops import core, dispatch, kernels, order
from csgn_tpu.secret_key import SecretKey


def _rand_wc(rng, chunks, ctx):
    w = rng.integers(0, 2**32, size=(ctx.words32, chunks), dtype=np.uint32)
    return jnp.asarray(w & ctx.valid_mask[:, None])


def _with_matches(rng, ctx, words, mask, n_force):
    """OR the mask into n_force random columns so the parity is non-trivial."""
    w_np = np.asarray(words).copy()
    if n_force:
        cols = rng.choice(w_np.shape[1], size=n_force, replace=False)
        w_np[:, cols] |= np.asarray(mask)[:, None]
    return jnp.asarray(w_np)


@pytest.fixture
def sk(ctx):
    return SecretKey.generate(ctx, jax.random.key(99))


# -- fused ragged kernel (direct, interpret mode) ----------------------------


@pytest.mark.parametrize("t1,t2,fa,fb", [(3, 1100, 1, 7), (2, 2048, 2, 4), (5, 1500, 3, 3)])
def test_mul_decrypt_ragged_kernel_matches_staged(ctx, sk, t1, t2, fa, fb):
    """Fused ragged kernel: product blocks + zero pads bit-exact to the
    unfused ragged kernel, parity == staged oracle over the padded product
    (pad chunks parity-neutral) == oracle over the true product."""
    rng = np.random.default_rng(t1 * 10000 + t2)
    mask = jnp.asarray(sk.mask)
    a = _with_matches(rng, ctx, _rand_wc(rng, t1, ctx), mask, fa)
    b = _with_matches(rng, ctx, _rand_wc(rng, t2, ctx), mask, fb)

    prod, parity = kernels.mul_decrypt_pallas_tiled_ragged(a, b, mask)
    want_padded = kernels.mul_chunks_pallas_tiled_ragged(a, b)
    np.testing.assert_array_equal(np.asarray(prod), np.asarray(want_padded))
    want = core.mul_chunks(a, b)
    assert int(parity) == int(core.decrypt_parity(want, mask))
    # the padded product decrypts to the same parity (pad neutrality)
    assert int(parity) == int(core.decrypt_parity(prod, mask))


def test_mul_decrypt_ragged_kernel_count(ctx, sk):
    rng = np.random.default_rng(17)
    mask = jnp.asarray(sk.mask)
    a = _with_matches(rng, ctx, _rand_wc(rng, 3, ctx), mask, 2)
    b = _with_matches(rng, ctx, _rand_wc(rng, 700, ctx), mask, 5)
    _, count = kernels.mul_decrypt_pallas_tiled_ragged(a, b, mask, return_count=True)
    want = int(np.sum(np.asarray(core.chunk_matches(core.mul_chunks(a, b), mask))))
    assert int(count) == want


def test_mul_decrypt_ragged_aligned_t2(ctx, sk):
    """t2 an exact multiple of the block: no boundary tile, no pad columns."""
    rng = np.random.default_rng(23)
    mask = jnp.asarray(sk.mask)
    a = _with_matches(rng, ctx, _rand_wc(rng, 2, ctx), mask, 1)
    t2 = kernels.ragged_bt(1024)  # bt divides t2 exactly
    b = _with_matches(rng, ctx, _rand_wc(rng, t2, ctx), mask, 3)
    prod, parity = kernels.mul_decrypt_pallas_tiled_ragged(a, b, mask)
    want = core.mul_chunks(a, b)
    np.testing.assert_array_equal(np.asarray(prod), np.asarray(want))
    assert int(parity) == int(core.decrypt_parity(want, mask))


# -- staged single-jit fallbacks ----------------------------------------------


def test_staged_jmajor_and_grouped_variants(ctx, sk):
    rng = np.random.default_rng(31)
    mask = jnp.asarray(sk.mask)
    a = _with_matches(rng, ctx, _rand_wc(rng, 6, ctx), mask, 2)
    b = _with_matches(rng, ctx, _rand_wc(rng, 5, ctx), mask, 2)
    want = core.mul_chunks(a, b)
    want_parity = int(core.decrypt_parity(want, mask))

    prod_jm, par_jm = dispatch._jit_staged_mul_decrypt("jm_xla", False)(a, b, mask)
    tag = order.cross_logical(None, None, 6, 5, jmajor=True)
    np.testing.assert_array_equal(
        np.asarray(order.canonicalize(prod_jm, tag)), np.asarray(want)
    )
    assert int(par_jm) == want_parity

    prod_g, par_g = dispatch._jit_staged_mul_decrypt("grouped", False)(a, b, mask)
    np.testing.assert_array_equal(np.asarray(prod_g), np.asarray(want))
    assert int(par_g) == want_parity

    _, cnt = dispatch._jit_staged_mul_decrypt("grouped", True)(a, b, mask)
    assert int(cnt) == int(np.sum(np.asarray(core.chunk_matches(want, mask))))


# -- SecretKey.mul_and_decrypt across forced routes ---------------------------


def _route_jm_flat(a, b, mask):
    out, v = kernels.mul_decrypt_pallas(b, a, mask)
    return out, True, 0, 0, v


def _route_jm_tiled(a, b, mask):
    out, v = kernels.mul_decrypt_pallas_tiled(b, a, mask)
    return out, True, 0, 0, v


def _route_ragged(a, b, mask):
    zp = kernels.ragged_padded(b.shape[-1]) - b.shape[-1]
    out, v = kernels.mul_decrypt_pallas_tiled_ragged(a, b, mask)
    return out, False, 0, zp, v


def _route_jm_ragged(a, b, mask):
    zp = kernels.ragged_padded(a.shape[-1]) - a.shape[-1]
    out, v = kernels.mul_decrypt_pallas_tiled_ragged(b, a, mask)
    return out, True, zp, 0, v


def _route_jm_xla(a, b, mask):
    out, v = dispatch._jit_staged_mul_decrypt("jm_xla", False)(a, b, mask)
    return out, True, 0, 0, v


@pytest.mark.parametrize(
    "route,t1,t2",
    [
        (_route_jm_flat, 128, 3), (_route_jm_tiled, 256, 2),
        (_route_ragged, 3, 999), (_route_jm_ragged, 777, 2),
        (_route_jm_xla, 9, 4),
    ],
    ids=["jm_flat", "jm_tiled", "ragged", "jm_ragged", "jm_xla"],
)
def test_mul_and_decrypt_forced_routes(ctx, sk, monkeypatch, route, t1, t2):
    """Every fused route: product canonicalizes to the oracle, parity matches,
    pad accounting is consistent (chunks excludes pads)."""
    monkeypatch.setattr(dispatch, "mul_decrypt_auto", route)
    rng = np.random.default_rng(t1 * 31 + t2)
    mask = jnp.asarray(sk.mask)
    ca = Ciphertext(_with_matches(rng, ctx, _rand_wc(rng, t1, ctx), mask, 3), ctx)
    cb = Ciphertext(_with_matches(rng, ctx, _rand_wc(rng, t2, ctx), mask, 2), ctx)

    prod, bit = sk.mul_and_decrypt(ca, cb)
    assert prod.chunks == t1 * t2
    want = core.mul_chunks(ca.wt, cb.wt)
    np.testing.assert_array_equal(prod.chunk_major().T, np.asarray(want))
    assert int(bit) == int(core.decrypt_parity(want, mask))


def test_mul_and_decrypt_tagged_padded_operands(ctx, sk, monkeypatch):
    """Fused auto on operands that ALREADY carry tags and pads (the chain
    shape class the round-3 dispatch silently degraded on)."""
    monkeypatch.setattr(dispatch, "mul_decrypt_auto", _route_jm_ragged)
    rng = np.random.default_rng(55)
    mask = jnp.asarray(sk.mask)
    base = Ciphertext(_with_matches(rng, ctx, _rand_wc(rng, 37, ctx), mask, 4), ctx)
    small = Ciphertext(_with_matches(rng, ctx, _rand_wc(rng, 3, ctx), mask, 1), ctx)

    # Build a padded, tag-carrying accumulator via the ragged multiply route.
    def ragged_auto(a, b):
        zp = kernels.ragged_padded(a.shape[-1]) - a.shape[-1]
        return kernels.mul_chunks_pallas_tiled_ragged(b, a), True, zp, 0

    monkeypatch.setattr(dispatch, "mul_chunks_auto", ragged_auto)
    acc = base * small
    assert acc.pad > 0 and not acc.is_canonical

    prod, bit = sk.mul_and_decrypt(acc, small)
    want = core.mul_chunks(core.mul_chunks(base.wt, small.wt), small.wt)
    np.testing.assert_array_equal(prod.chunk_major().T, np.asarray(want))
    assert int(bit) == int(core.decrypt_parity(want, mask))


def test_mul_and_decrypt_eager_order(ctx, sk):
    rng = np.random.default_rng(77)
    mask = jnp.asarray(sk.mask)
    ca = Ciphertext(_with_matches(rng, ctx, _rand_wc(rng, 5, ctx), mask, 2), ctx)
    cb = Ciphertext(_with_matches(rng, ctx, _rand_wc(rng, 3, ctx), mask, 2), ctx)
    prev = set_eager_order(True)
    try:
        prod, bit = sk.mul_and_decrypt(ca, cb)
        assert prod.is_canonical and prod.pad == 0
        want = core.mul_chunks(ca.wt, cb.wt)
        np.testing.assert_array_equal(np.asarray(prod.wt), np.asarray(want))
        assert int(bit) == int(core.decrypt_parity(want, mask))
    finally:
        set_eager_order(prev)


# -- batched fused auto --------------------------------------------------------


def _b_route_jm_ragged(a, b, mask):
    zp = kernels.ragged_padded(a.shape[-1]) - a.shape[-1]
    out, bits = jax.vmap(
        lambda x, y: kernels.mul_decrypt_pallas_tiled_ragged(y, x, mask)
    )(a, b)
    return out, True, zp, 0, bits


def test_mul_and_decrypt_batch_forced_ragged(ctx, sk, monkeypatch):
    from csgn_tpu.batch import CiphertextBatch

    monkeypatch.setattr(dispatch, "mul_decrypt_batched_auto", _b_route_jm_ragged)
    rng = np.random.default_rng(88)
    mask = jnp.asarray(sk.mask)
    B, t1, t2 = 3, 70, 2
    a = np.stack([np.asarray(_with_matches(rng, ctx, _rand_wc(rng, t1, ctx), mask, 2)) for _ in range(B)])
    b = np.stack([np.asarray(_with_matches(rng, ctx, _rand_wc(rng, t2, ctx), mask, 1)) for _ in range(B)])
    cb1 = CiphertextBatch(jnp.asarray(a), ctx)
    cb2 = CiphertextBatch(jnp.asarray(b), ctx)

    prod, bits = sk.mul_and_decrypt_batch(cb1, cb2)
    assert prod.chunks == t1 * t2 and prod.pad > 0
    want = core.mul_chunks(jnp.asarray(a), jnp.asarray(b))
    got = np.asarray(
        order.canonicalize(prod.wt, prod.logical, prod.chunks)
    )
    np.testing.assert_array_equal(got, np.asarray(want))
    np.testing.assert_array_equal(
        np.asarray(bits), np.asarray(core.decrypt_parity(want, mask))
    )


def test_mul_decrypt_batched_auto_xla_fallback(ctx, sk):
    """CPU default route: staged XLA, canonical order, per-element parity."""
    rng = np.random.default_rng(5)
    mask = jnp.asarray(sk.mask)
    B = 4
    a = jnp.stack([_with_matches(rng, ctx, _rand_wc(rng, 3, ctx), mask, 1) for _ in range(B)])
    b = jnp.stack([_with_matches(rng, ctx, _rand_wc(rng, 2, ctx), mask, 1) for _ in range(B)])
    out, jmajor, zp_a, zp_b, bits = dispatch.mul_decrypt_batched_auto(a, b, mask)
    assert (jmajor, zp_a, zp_b) == (False, 0, 0)
    want = core.mul_chunks(a, b)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))
    np.testing.assert_array_equal(
        np.asarray(bits), np.asarray(core.decrypt_parity(want, mask))
    )


def test_mul_decrypt_auto_xla_fallback_matches_staged(ctx, sk):
    rng = np.random.default_rng(6)
    mask = jnp.asarray(sk.mask)
    a = _with_matches(rng, ctx, _rand_wc(rng, 7, ctx), mask, 3)
    b = _with_matches(rng, ctx, _rand_wc(rng, 4, ctx), mask, 2)
    out, jmajor, zp_a, zp_b, parity = dispatch.mul_decrypt_auto(a, b, mask)
    assert (jmajor, zp_a, zp_b) == (False, 0, 0)
    want = core.mul_chunks(a, b)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))
    assert int(parity) == int(core.decrypt_parity(want, mask))
