"""Reference API-surface parity details: size accounting, functional context
updates, corrupted-order-tag loudness."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from csgn_tpu import Ciphertext, Context, SecretKey
from csgn_tpu.ops import order


def test_secret_key_size_matches_reference(ctx, rng):
    # Reference src/SecretKey.cpp:268-276 prints 144 B at Context(1247, 16).
    sk = SecretKey.generate(ctx, rng)
    assert sk.size() == 144


def test_ciphertext_size_matches_reference(ctx, rng):
    # Reference src/Ciphertext.cpp:91-101: fresh=352 B, after add=672 B,
    # after (fresh x fresh) multiply=352 B (tests/timings.cpp output).
    sk = SecretKey.generate(ctx, rng)
    c1 = sk.encrypt(1, rng)
    assert c1.size() == 352
    assert (c1 + c1).size() == 672
    assert (c1 * c1).size() == 352


def test_context_with_n_with_d_recompute_derived():
    ctx = Context(1247, 16)
    c2 = ctx.with_n(4095)
    assert (c2.n, c2.d) == (4095, 16)
    assert c2.words64 == 64 and c2.s == 4095 // 32
    assert len(c2.valid_mask) == c2.words32
    c3 = ctx.with_d(32)
    assert (c3.n, c3.d) == (1247, 32)
    assert c3.s == 1247 // 64
    # The original is untouched (frozen).
    assert (ctx.n, ctx.d) == (1247, 16)
    with pytest.raises(dataclasses.FrozenInstanceError):
        ctx.n = 1


def test_corrupted_order_tag_fails_loudly(ctx, rng):
    """A tag that is not a permutation of [0, out_len) must not silently alias
    column 0: unwritten logical slots decode to all-ones columns, which break
    canonical form (padding bits set) and are caught by validation."""
    from csgn_tpu.utils import checks

    sk = SecretKey.generate(ctx, rng)
    wt = sk.encrypt_batch(jnp.asarray([1, 0, 1, 0], dtype=jnp.uint8), rng)
    bad_tag = jnp.asarray([0, 0, 2, 3], dtype=jnp.int32)  # slot 1 never written
    out = order.canonicalize(wt, bad_tag)
    col = np.asarray(out)[:, 1]
    assert np.all(col == 0xFFFFFFFF)
    ct = Ciphertext(out, ctx)
    with pytest.raises(ValueError):
        checks.validate_ciphertext(ct)
