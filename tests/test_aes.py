"""AES-128 netlist: FIPS-197 anchors, an independent table oracle, and the
growth-free homomorphic path at published-circuit scale (~229k gates).

The reference framework never composes more than a couple of gates
(/root/reference/tests/basic_operations.cpp:30-43); this exercises the
netlist layer at the scale of the published MPC benchmark suite's flagship
circuit, including the accounting saturation (`circuit.CHUNKS_SAT`) that
deep circuits require (the exact chunk count of an AND-depth-40 circuit has
~10^24 bits — computing it is itself infeasible).
"""

import random

import jax
import pytest

from csgn_tpu import SecretKey
from csgn_tpu.circuit import CHUNKS_SAT, sat_add, sat_mul
from csgn_tpu.models.aes import AES_RCON, aes128
from csgn_tpu.models.netlist import (
    Netlist,
    bits_from_bytes as _bits,
    bytes_from_bits as _unbits,
    eval_expr,
    eval_plain,
)

# FIPS-197 Appendix C.1 (key/plaintext/ciphertext) and Appendix B.
FIPS_C1 = (
    bytes(range(16)),
    bytes.fromhex("00112233445566778899aabbccddeeff"),
    bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a"),
)
FIPS_B = (
    bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c"),
    bytes.fromhex("3243f6a8885a308d313198a2e0370734"),
    bytes.fromhex("3925841d02dc09fbdc118597196a0b32"),
)


# -- independent oracle: table-based AES (log-free square-and-multiply S-box) ----


def _gmul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return p


def _make_sbox() -> list[int]:
    box = []
    for x in range(256):
        inv, base, e = (1, x, 254) if x else (0, 0, 0)
        while e:
            if e & 1:
                inv = _gmul(inv, base)
            base = _gmul(base, base)
            e >>= 1
        r = 0
        for i in range(8):
            bit = (
                (inv >> i)
                ^ (inv >> ((i + 4) % 8))
                ^ (inv >> ((i + 5) % 8))
                ^ (inv >> ((i + 6) % 8))
                ^ (0x63 >> i)
                ^ (inv >> ((i + 7) % 8))
            ) & 1
            r |= bit << i
        box.append(r)
    return box


_SBOX = _make_sbox()


def _aes_oracle(key: bytes, pt: bytes) -> bytes:
    w = [list(key[4 * i: 4 * i + 4]) for i in range(4)]
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = [_SBOX[b] for b in t[1:] + t[:1]]
            t[0] ^= AES_RCON[i // 4 - 1]
        w.append([w[i - 4][k] ^ t[k] for k in range(4)])
    s = [pt[j] ^ w[j // 4][j % 4] for j in range(16)]
    for rnd in range(1, 11):
        s = [_SBOX[b] for b in s]
        s = [s[(j % 4) + 4 * ((j // 4 + j % 4) % 4)] for j in range(16)]
        if rnd < 10:
            ns = []
            for c in range(4):
                col = s[4 * c: 4 * c + 4]
                for r in range(4):
                    ns.append(
                        _gmul(col[r], 2)
                        ^ _gmul(col[(r + 1) % 4], 3)
                        ^ col[(r + 2) % 4]
                        ^ col[(r + 3) % 4]
                    )
            s = ns
        s = [s[j] ^ w[4 * rnd + j // 4][j % 4] for j in range(16)]
    return bytes(s)


@pytest.fixture(scope="module")
def nl() -> Netlist:
    return aes128()


def test_sbox_table_anchors():
    """The oracle's own S-box hits the FIPS-197 worked-example anchors."""
    assert _SBOX[0x00] == 0x63 and _SBOX[0x01] == 0x7C and _SBOX[0x53] == 0xED


def test_fips_vectors_plain(nl):
    for key, pt, ct in (FIPS_C1, FIPS_B):
        assert _aes_oracle(key, pt) == ct  # the oracle itself
        (out,) = eval_plain(nl, [_bits(key), _bits(pt)])
        assert _unbits(out) == ct


def test_random_vs_table_oracle(nl):
    rnd = random.Random(0xAE5)
    for _ in range(5):
        key = bytes(rnd.getrandbits(8) for _ in range(16))
        pt = bytes(rnd.getrandbits(8) for _ in range(16))
        (out,) = eval_plain(nl, [_bits(key), _bits(pt)])
        assert _unbits(out) == _aes_oracle(key, pt)


def test_shape_and_growth_saturation(nl):
    assert nl.input_sizes == (128, 128) and nl.output_sizes == (128,)
    assert nl.and_count == 51_200  # 200 S-box instances x 256 ANDs
    g = nl.growth()
    assert max(g) == CHUNKS_SAT  # deep circuits saturate instead of hanging


def test_file_roundtrip_at_scale(nl, tmp_path):
    """Serialize to Bristol-Fashion text, re-read FROM DISK, same circuit."""
    p = tmp_path / "aes128.txt"
    p.write_text(nl.to_text())
    again = Netlist.parse(p.read_text())
    assert again == nl
    key, pt, ct = FIPS_C1
    (out,) = eval_plain(again, [_bits(key), _bits(pt)])
    assert _unbits(out) == ct


def test_homomorphic_expr_end_to_end(nl, small_ctx):
    """Encrypt all 256 input bits, evaluate the full cipher as a CtExpr DAG,
    decrypt key-side: the ciphertext block of FIPS-197 C.1, bit for bit."""
    keys = jax.random.split(jax.random.key(0xAE5128), 3)
    sk = SecretKey.generate(small_ctx, keys[0])
    one = sk.encrypt(1, keys[1])
    key, pt, ct = FIPS_C1
    ks = jax.random.split(keys[2], 256)
    enc_key = [sk.encrypt(b, ks[i]) for i, b in enumerate(_bits(key))]
    enc_pt = [sk.encrypt(b, ks[128 + i]) for i, b in enumerate(_bits(pt))]
    (outs,) = eval_expr(nl, [enc_key, enc_pt], one)
    assert outs[0].chunks == CHUNKS_SAT  # materializing would be absurd
    got = _unbits([int(v) for v in sk.decrypt_circuits(outs)])
    assert got == ct


def test_homomorphic_fleet_expr(nl, small_ctx):
    """A B=3 fleet (three different AES keys, one block) through ONE expr
    DAG over CiphertextBatch wires: every instance's 128-bit output equals
    the table oracle."""
    import numpy as np

    from csgn_tpu.batch import CiphertextBatch

    B = 3
    aes_keys = [bytes([17 * b + 1] * 16) for b in range(B)]
    block = FIPS_C1[1]
    keys = jax.random.split(jax.random.key(0xF1EE7), 4)
    sk = SecretKey.generate(small_ctx, keys[0])
    one = sk.encrypt(1, keys[1])

    def wire_batch(bit_lists, key, i):
        return CiphertextBatch.stack(
            [
                sk.encrypt(bit_lists[b][i], jax.random.fold_in(key, B * i + b))
                for b in range(B)
            ]
        )

    kb = [_bits(k) for k in aes_keys]
    pb = [_bits(block)] * B
    key_w = [wire_batch(kb, keys[2], i) for i in range(128)]
    pt_w = [wire_batch(pb, keys[3], i) for i in range(128)]
    (outs,) = eval_expr(nl, [key_w, pt_w], one)
    res = sk.decrypt_circuits(outs)
    assert all(isinstance(r, np.ndarray) and r.shape == (B,) for r in res)
    for b in range(B):
        got = _unbits([int(r[b]) for r in res])
        assert got == _aes_oracle(aes_keys[b], block), b


# -- saturating accounting unit tests ---------------------------------------------


def test_sat_arithmetic():
    assert sat_add(3, 4) == 7 and sat_mul(3, 4) == 12  # exact below cap
    assert sat_add(CHUNKS_SAT - 1, 1) == CHUNKS_SAT
    assert sat_add(CHUNKS_SAT, CHUNKS_SAT) == CHUNKS_SAT
    assert sat_mul(CHUNKS_SAT, 2) == CHUNKS_SAT
    assert sat_mul(1 << 32, 1 << 31) == CHUNKS_SAT
    assert sat_mul(0, CHUNKS_SAT) == 0
    assert sat_mul((1 << 32) + 1, 1 << 31) == CHUNKS_SAT
