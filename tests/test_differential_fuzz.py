"""Differential fuzzing: random op programs, JAX pipeline vs native C++ oracle.

Every program interleaves add / mul / permute on ciphertexts held in BOTH
representations (word-major device arrays and chunk-major native buffers);
words must match bit-for-bit after every step, and decrypt must agree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csgn_tpu import Ciphertext, Permutation, SecretKey
from csgn_tpu.native import binding
from csgn_tpu.ops import core


@pytest.mark.parametrize("seed", range(8))
def test_random_program_vs_native(small_ctx, seed):
    rng = np.random.default_rng(seed)
    keys = jax.random.split(jax.random.key(seed), 16)
    sk = SecretKey.generate(small_ctx, keys[0])
    perm = Permutation(rng.permutation(small_ctx.n).astype(np.int32))

    # Start state: two fresh ciphertexts in both representations.
    bits = [int(rng.integers(0, 2)) for _ in range(2)]
    cts = [sk.encrypt(b, keys[1 + i]) for i, b in enumerate(bits)]
    natives = [ct.chunk_major() for ct in cts]
    plains = list(bits)

    for step in range(6):
        op = rng.choice(["add", "mul", "permute", "fresh"])
        i = int(rng.integers(0, len(cts)))
        j = int(rng.integers(0, len(cts)))
        if op == "add":
            cts[i] = cts[i] + cts[j]
            natives[i] = np.concatenate([natives[i], natives[j]])
            plains[i] ^= plains[j]
        elif op == "mul":
            if cts[i].chunks * cts[j].chunks > 128:
                continue
            cts[i] = cts[i] * cts[j]
            natives[i] = binding.mul(natives[i], natives[j])
            plains[i] &= plains[j]
        elif op == "permute":
            cts[i] = cts[i].apply_permutation(perm)
            natives[i] = binding.permute(natives[i], perm.perm, small_ctx.n)
            # decrypt equivalence needs the permuted key below; to keep one
            # key, permute back immediately (p then p^-1 = identity).
            inv = perm.inverse()
            cts[i] = cts[i].apply_permutation(inv)
            natives[i] = binding.permute(natives[i], inv.perm, small_ctx.n)
        else:
            b = int(rng.integers(0, 2))
            cts.append(sk.encrypt(b, keys[8 + step]))
            natives.append(cts[-1].chunk_major())
            plains.append(b)

        for k, (ct, nat) in enumerate(zip(cts, natives)):
            np.testing.assert_array_equal(ct.chunk_major(), nat, err_msg=f"seed={seed} step={step} ct={k}")

    for ct, nat, plain in zip(cts, natives, plains):
        assert int(sk.decrypt(ct)) == binding.decrypt(nat, sk.mask) == plain


@pytest.mark.parametrize("seed", range(3))
def test_random_program_vs_native_large_params(seed):
    """Same differential program at the large-parameter config Context(4095,
    32) — 128 uint32 words/chunk, the BASELINE config-4 shape class (the
    native oracle is pure C++, so this also fuzzes the 64-bit word packing
    at a non-trivial width)."""
    from csgn_tpu.context import Context

    big_ctx = Context(4095, 32)
    rng = np.random.default_rng(1000 + seed)
    keys = jax.random.split(jax.random.key(seed), 8)
    sk = SecretKey.generate(big_ctx, keys[0])
    perm = Permutation(rng.permutation(big_ctx.n).astype(np.int32))

    bits = [int(rng.integers(0, 2)) for _ in range(2)]
    cts = [sk.encrypt(b, keys[1 + i]) for i, b in enumerate(bits)]
    natives = [ct.chunk_major() for ct in cts]
    plains = list(bits)

    for step in range(4):
        op = rng.choice(["add", "mul", "permute"])
        i = int(rng.integers(0, len(cts)))
        j = int(rng.integers(0, len(cts)))
        if op == "add":
            cts[i] = cts[i] + cts[j]
            natives[i] = np.concatenate([natives[i], natives[j]])
            plains[i] ^= plains[j]
        elif op == "mul":
            if cts[i].chunks * cts[j].chunks > 32:
                continue
            cts[i] = cts[i] * cts[j]
            natives[i] = binding.mul(natives[i], natives[j])
            plains[i] &= plains[j]
        else:
            cts[i] = cts[i].apply_permutation(perm)
            natives[i] = binding.permute(natives[i], perm.perm, big_ctx.n)
            inv = perm.inverse()
            cts[i] = cts[i].apply_permutation(inv)
            natives[i] = binding.permute(natives[i], inv.perm, big_ctx.n)

        for k, (ct, nat) in enumerate(zip(cts, natives)):
            np.testing.assert_array_equal(
                ct.chunk_major(), nat, err_msg=f"seed={seed} step={step} ct={k}"
            )

    for ct, nat, plain in zip(cts, natives, plains):
        assert int(sk.decrypt(ct)) == binding.decrypt(nat, sk.mask) == plain
