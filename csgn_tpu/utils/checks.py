"""Runtime validation — the framework's sanitizer story (SURVEY.md §5).

The reference ships real memory bugs with no sanitizers (use-after-free in
operator=, SURVEY.md §2b.1; out-of-bounds bitlen write for n%64==0).  The
functional JAX design removes that bug class; what remains worth checking is
*data* validity, enforced here:

  * canonical form: no set bits at positions >= n (padding words clean);
  * chunk-count sanity: every ciphertext is a whole number of chunks;
  * key validity: d distinct in-range indices, mask popcount == d.

`validate_ciphertext` / `validate_key` are host-side (test/debug entry
points); `checked_decrypt` shows the `checkify` pattern for jit-time checks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import checkify

from csgn_tpu.ciphertext import Ciphertext
from csgn_tpu.ops import core
from csgn_tpu.secret_key import SecretKey

__all__ = ["validate_ciphertext", "validate_key", "checked_decrypt"]


def validate_ciphertext(ct: Ciphertext) -> None:
    """Raise ValueError on any canonical-form violation (host-side)."""
    wt = np.asarray(jax.device_get(ct.wt))
    if wt.dtype != np.uint32:
        raise ValueError(f"ciphertext words must be uint32, got {wt.dtype}")
    if wt.shape[0] != ct.ctx.words32:
        raise ValueError(f"word count {wt.shape[0]} != context words32 {ct.ctx.words32}")
    bad = wt & ~ct.ctx.valid_mask[:, None]
    if bad.any():
        w, c = np.argwhere(bad)[0]
        raise ValueError(
            f"non-canonical ciphertext: set bit beyond n={ct.ctx.n} "
            f"in chunk {c}, word {w} (value {bad[w, c]:#010x})"
        )


def validate_key(sk: SecretKey) -> None:
    """Raise ValueError if the key/mask pair is inconsistent (host-side)."""
    d = sk.ctx.d
    if len(np.unique(sk.indices)) != d:
        raise ValueError("key indices not distinct")
    pop = int(sum(int(x).bit_count() for x in sk.mask))
    if pop != d:
        raise ValueError(f"mask popcount {pop} != d {d}")


def checked_decrypt(words: jax.Array, mask: jax.Array, valid_mask: jax.Array):
    """Jit-compatible decrypt with checkify guards on canonical form.

    Returns (error, parity); `error.throw()` raises on violation.  This is the
    pattern for embedding data-validity checks inside compiled pipelines.
    """

    def fn(words, mask, valid_mask):
        bad = jnp.any(words & ~valid_mask[:, None])
        checkify.check(~bad, "non-canonical ciphertext: bits set beyond n")
        return core.decrypt_parity(words, mask)

    return checkify.checkify(fn)(words, mask, valid_mask)
