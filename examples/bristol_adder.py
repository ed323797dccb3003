"""Encrypted 64-bit addition from a standard Bristol-Fashion circuit file.

Loads the committed `tests/circuits/adder64.txt` (published-suite interface:
two 64-bit little-endian inputs -> one 64-bit sum, blank header separator,
outputs on the final wires), encrypts two integers bit-by-bit, evaluates the
circuit homomorphically with ZERO device growth (`eval_expr` builds +/* DAGs
— the materialized top carry would exceed 2^60 chunks, reference growth
semantics /root/reference/src/Ciphertext.cpp:107-163), and decrypts the sum
key-side in O(leaves) per bit with `decrypt_circuit`.

This is the ecosystem-interop path: any {XOR, AND, INV, EQ, EQW} circuit in
the published format drops in the same way (multi-output MAND lines can be
expanded with `Netlist.parse(..., expand_mand=True)`).

Run: python examples/bristol_adder.py [--x 123456789] [--y 987654321]
"""

from __future__ import annotations

import argparse
import pathlib

CIRCUIT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "circuits" / "adder64.txt"


def main(x: int = 123456789, y: int = 987654321, n: int = 95, d: int = 4,
         seed: int = 0) -> dict:
    import jax

    from csgn_tpu import Context, SecretKey
    from csgn_tpu.models.netlist import Netlist, eval_expr, eval_plain

    nl = Netlist.parse(CIRCUIT.read_text())
    assert nl.input_sizes == (64, 64) and nl.output_sizes == (64,)

    ctx = Context(n, d)
    keys = jax.random.split(jax.random.key(seed), 130)
    sk = SecretKey.generate(ctx, keys[0])
    one = sk.encrypt(1, keys[1])

    bits_x = [(x >> i) & 1 for i in range(64)]
    bits_y = [(y >> i) & 1 for i in range(64)]
    enc_x = [sk.encrypt(b, keys[2 + i]) for i, b in enumerate(bits_x)]
    enc_y = [sk.encrypt(b, keys[66 + i]) for i, b in enumerate(bits_y)]

    (expr_out,) = eval_expr(nl, [enc_x, enc_y], one)
    want = (x + y) % 2**64
    # Plain-oracle check of the whole circuit, then decrypt a sample of the
    # encrypted output bits (each decrypt_circuit folds the bit's DAG).
    (plain,) = eval_plain(nl, [bits_x, bits_y])
    plain_val = sum(b << i for i, b in enumerate(plain))
    assert plain_val == want, (plain_val, want)

    # All 64 output DAGs share the 128 input leaves: decrypt_circuits
    # decrypts the leaf set in ONE batched dispatch and folds every DAG
    # host-side (vs 64 x 128 leaf decrypts with per-bit decrypt_circuit).
    out_bits = [int(v) for v in sk.decrypt_circuits(expr_out)]
    got = sum(b << i for i, b in enumerate(out_bits))
    assert got == want, (got, want)

    out = {
        "x": x, "y": y, "sum": want,
        "gates": len(nl.gates), "and_gates": nl.and_count,
        "materialized_growth_max": max(nl.growth()),
        "decrypted_bits_checked": 64,
    }
    print(f"adder64: {x} + {y} = {want}  "
          f"({len(nl.gates)} gates, {nl.and_count} ANDs, "
          f"materialized growth would be {out['materialized_growth_max']:.2e} chunks; "
          f"all 64 output bits decrypted via one batched leaf decrypt)")
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--x", type=int, default=123456789)
    ap.add_argument("--y", type=int, default=987654321)
    args = ap.parse_args()
    main(args.x, args.y)
