"""Pallas hardware-PRNG encrypt engine.

The kernel itself is TPU-only (the on-core PRNG has no CPU lowering); full
correctness (invariants + decrypt round-trip at 2^12 batch, 1.27 B enc/s at
2^20) is validated on the real chip by the .tpuq worker jobs.  Here we test
the API surface and error paths on CPU.
"""

import jax
import jax.numpy as jnp
import pytest

from csgn_tpu import SecretKey


def test_pallas_engine_requires_tpu(ctx, rng):
    sk = SecretKey.generate(ctx, rng)
    bits = jnp.asarray([0, 1], dtype=jnp.uint8)
    if jax.default_backend() == "tpu":
        pytest.skip("running on TPU: engine works; covered by worker validation")
    with pytest.raises(NotImplementedError, match="pallas"):
        sk.encrypt_batch(bits, 7, engine="pallas")


def test_unknown_engine_rejected(ctx, rng):
    sk = SecretKey.generate(ctx, rng)
    with pytest.raises(ValueError, match="unknown encrypt engine"):
        sk.encrypt_batch(jnp.asarray([1], dtype=jnp.uint8), rng, engine="bogus")
