"""Deep multiplication chain with growth budgeting and key-side recrypt.

Shows the bounded-HE lifecycle: chunk counts square under multiply, so long
circuits interleave homomorphic work (server) with recrypt growth resets
(key holder).  Mirrors the BASELINE "8-32 deep mult chains" config.

Run: python examples/deep_chain.py [--depth 16] [--recrypt-at 4096]
"""

from __future__ import annotations

import argparse


def main(depth: int = 16, recrypt_at: int = 4096, n: int = 95, d: int = 4, seed: int = 0) -> dict:
    import jax

    from csgn_tpu import Context, SecretKey
    from csgn_tpu.pipeline import chain_chunks

    ctx = Context(n, d)
    keys = jax.random.split(jax.random.key(seed), 2 * depth + 2)
    sk = SecretKey.generate(ctx, keys[0])

    acc = sk.encrypt(1, keys[1])
    expect = 1
    recrypts = 0
    peak_chunks = 1
    for i in range(depth):
        bit = 1  # all-ones keeps the product alive through full depth
        operand = sk.encrypt(bit, keys[2 * i]) + sk.encrypt(0, keys[2 * i + 1])  # 2 chunks
        if acc.chunks * operand.chunks > recrypt_at:
            acc = sk.recrypt(acc, keys[2 * i + 1])   # growth reset (key holder)
            recrypts += 1
        acc = acc * operand
        expect &= bit
        peak_chunks = max(peak_chunks, acc.chunks)

    got = int(sk.decrypt(acc))
    assert got == expect, (got, expect)
    return {
        "depth": depth,
        "final_chunks": acc.chunks,
        "peak_chunks": peak_chunks,
        "recrypts": recrypts,
        "unbounded_chunks_would_be": chain_chunks([2] * depth),
        "decrypted": got,
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--recrypt-at", type=int, default=4096)
    args = ap.parse_args()
    print(main(args.depth, args.recrypt_at))
