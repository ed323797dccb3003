"""Lazy chunk-order tags: decouple physical chunk layout from reference order.

Decryption is a parity over the *multiset* of chunks (reference
src/SecretKey.cpp:126-140), so the order of chunks inside a ciphertext is
semantically irrelevant to every homomorphic operator; only the reference's
observable byte layout (serialization, printing, golden comparisons) pins the
canonical order ``i*t2 + j`` for multiply (src/Ciphertext.cpp:159) and
"left then right" for add (src/Ciphertext.cpp:107-122).

On TPU, producing the canonical i-major multiply order physically is a
lane-granularity interleave whenever t2 is small/unaligned — measured 3-6x
slower than the j-major order, which is just a concatenation of aligned
elementwise ANDs (docs/performance.md).  So the framework materializes
whichever order the hardware likes and carries a **logical index tag**:

    logical: int32[chunks] | None     # physical position p holds the chunk
                                      # whose reference-order index is logical[p]
    None                              # identity: physical == canonical

Tags compose through every operator in O(chunks) integer work (2.5% of
payload bytes at W=40) and are resolved by a single gather at interop
boundaries (`canonicalize`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "concat_logical",
    "cross_logical",
    "canonicalize",
    "inverse_permutation",
]


def _iota(n: int) -> jax.Array:
    return jnp.arange(n, dtype=jnp.int32)


def concat_logical(
    la: jax.Array | None, lb: jax.Array | None, t1: int, t2: int
) -> jax.Array | None:
    """Order tag for add = [a ; b]: b's logical indices shift by t1."""
    if la is None and lb is None:
        return None
    ia = la if la is not None else _iota(t1)
    ib = lb if lb is not None else _iota(t2)
    return jnp.concatenate([ia, ib + jnp.int32(t1)])


def cross_logical(
    la: jax.Array | None,
    lb: jax.Array | None,
    t1: int,
    t2: int,
    *,
    jmajor: bool,
) -> jax.Array | None:
    """Order tag for a physical chunk cross-product.

    The logical index of the product of a's chunk (logical i) with b's chunk
    (logical j) is ``i*t2 + j`` (reference src/Ciphertext.cpp:159).  Physical
    layout is either i-major (canonical, ``p = p1*t2 + p2``) or j-major
    (``p = p2*t1 + p1``, the TPU-friendly order).
    """
    if la is None and lb is None and not jmajor:
        return None
    ia = la if la is not None else _iota(t1)
    ib = lb if lb is not None else _iota(t2)
    if jmajor:
        return (ib[:, None] + ia[None, :] * jnp.int32(t2)).reshape(t1 * t2)
    return (ia[:, None] * jnp.int32(t2) + ib[None, :]).reshape(t1 * t2)


def inverse_permutation(perm: jax.Array) -> jax.Array:
    """inv with inv[perm[p]] = p (perm must be a permutation of [0, C))."""
    c = perm.shape[0]
    return jnp.zeros((c,), jnp.int32).at[perm].set(_iota(c))


@jax.jit
def canonicalize(words: jax.Array, logical: jax.Array) -> jax.Array:
    """Reorder payload columns into canonical order: out[:, logical[p]] = in[:, p].

    One lane-axis gather over the payload — the only cost lazy ordering ever
    pays, and only at interop boundaries.
    """
    return jnp.take(words, inverse_permutation(logical), axis=-1)
