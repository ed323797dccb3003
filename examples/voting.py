"""Encrypted-ballot demo: parity and unanimity over homomorphic bits.

CSGN/CertSGN was built by certSIGN for e-voting-style workloads: each voter
encrypts one bit; the untrusted tally server combines ciphertexts without the
key.  With XOR (+) and AND (*) available homomorphically we can compute:

  * parity of all votes       — one `+` fold (cheap: chunk concat), and
  * unanimity (all voted 1)   — one `*` fold (chunk growth: 1 chunk/vote).

Run: python examples/voting.py [--voters 64] [--n 1247] [--d 16]
"""

from __future__ import annotations

import argparse

import numpy as np


def main(voters: int = 64, n: int = 1247, d: int = 16, seed: int = 0) -> dict:
    import jax
    import jax.numpy as jnp

    from csgn_tpu import Ciphertext, Context, SecretKey
    from csgn_tpu.pipeline import mul_chain

    ctx = Context(n, d)
    k_key, k_enc, k_votes = jax.random.split(jax.random.key(seed), 3)

    # Election authority: keygen.  Voters: encrypt one bit each (batched).
    sk = SecretKey.generate(ctx, k_key)
    votes = np.asarray(jax.random.bernoulli(k_votes, 0.9, (voters,))).astype(np.uint8)
    words = sk.encrypt_batch(jnp.asarray(votes), k_enc)          # [W, voters]

    # --- untrusted tally server: no key from here on -----------------------
    # Parity: the batch IS the XOR-fold (chunks concatenated).
    parity_ct = Ciphertext(words, ctx)
    # Unanimity: AND-fold via the fused multiplication chain.
    per_voter = [Ciphertext(words[:, i : i + 1], ctx) for i in range(voters)]
    unanimity_ct = mul_chain(per_voter)                          # 1 chunk (1^voters)

    # --- authority decrypts ------------------------------------------------
    parity = int(sk.decrypt(parity_ct))
    unanimous = int(sk.decrypt(unanimity_ct))

    expect_parity = int(votes.sum() % 2)
    expect_unanimous = int(votes.all())
    assert parity == expect_parity, (parity, expect_parity)
    assert unanimous == expect_unanimous, (unanimous, expect_unanimous)
    return {
        "voters": voters,
        "yes_votes": int(votes.sum()),
        "parity": parity,
        "unanimous": unanimous,
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--voters", type=int, default=64)
    ap.add_argument("--n", type=int, default=1247)
    ap.add_argument("--d", type=int, default=16)
    args = ap.parse_args()
    out = main(args.voters, args.n, args.d)
    print(out)
