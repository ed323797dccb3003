"""Homomorphic circuit layer: truth tables + multi-bit arithmetic."""

import itertools

import jax
import pytest

from csgn_tpu import SecretKey
from csgn_tpu.models import Gates


@pytest.fixture(scope="module")
def setup(small_ctx):
    keys = jax.random.split(jax.random.key(0), 8)
    sk = SecretKey.generate(small_ctx, keys[0])
    g = Gates(sk.encrypt(1, keys[1]))
    return sk, g, keys


def _enc_pair(sk, keys, a, b):
    return sk.encrypt(a, keys[2 + a]), sk.encrypt(b, keys[4 + b])


def test_binary_gate_truth_tables(setup):
    sk, g, keys = setup
    table = {
        "xor": (g.xor, lambda a, b: a ^ b),
        "and": (g.and_, lambda a, b: a & b),
        "or": (g.or_, lambda a, b: a | b),
        "nand": (g.nand, lambda a, b: 1 - (a & b)),
        "nor": (g.nor, lambda a, b: 1 - (a | b)),
        "xnor": (g.xnor, lambda a, b: 1 - (a ^ b)),
    }
    for a, b in itertools.product((0, 1), repeat=2):
        ca, cb = _enc_pair(sk, keys, a, b)
        for name, (gate, ref) in table.items():
            assert int(sk.decrypt(gate(ca, cb))) == ref(a, b), (name, a, b)


def test_not_and_mux(setup):
    sk, g, keys = setup
    for a in (0, 1):
        ca = sk.encrypt(a, keys[2 + a])
        assert int(sk.decrypt(g.not_(ca))) == 1 - a
    for s, a, b in itertools.product((0, 1), repeat=3):
        cs = sk.encrypt(s, keys[6])
        ca, cb = _enc_pair(sk, keys, a, b)
        assert int(sk.decrypt(g.mux(cs, ca, cb))) == (a if s else b), (s, a, b)


def test_full_adder_truth_table(setup):
    sk, g, keys = setup
    for a, b, c in itertools.product((0, 1), repeat=3):
        ca, cb = _enc_pair(sk, keys, a, b)
        cc = sk.encrypt(c, keys[7])
        s, cout = g.full_adder(ca, cb, cc)
        total = a + b + c
        assert int(sk.decrypt(s)) == total & 1, (a, b, c)
        assert int(sk.decrypt(cout)) == total >> 1, (a, b, c)


def test_ripple_add_3bit(setup):
    sk, g, keys = setup

    def enc_num(x, width, key):
        ks = jax.random.split(key, width)
        return [sk.encrypt((x >> i) & 1, ks[i]) for i in range(width)]

    for x, y in [(0, 0), (3, 5), (7, 7), (2, 6)]:
        a_bits = enc_num(x, 3, jax.random.key(100 + x))
        b_bits = enc_num(y, 3, jax.random.key(200 + y))
        s_bits, carry = g.ripple_add(a_bits, b_bits)
        got = sum(int(sk.decrypt(s)) << i for i, s in enumerate(s_bits))
        got |= int(sk.decrypt(carry)) << 3
        assert got == x + y, (x, y, got)


def test_equals(setup):
    sk, g, keys = setup

    def enc_num(x, width, key):
        ks = jax.random.split(key, width)
        return [sk.encrypt((x >> i) & 1, ks[i]) for i in range(width)]

    for x, y in [(5, 5), (5, 3), (0, 0), (7, 6)]:
        a = enc_num(x, 3, jax.random.key(300 + x))
        b = enc_num(y, 3, jax.random.key(400 + y))
        assert int(sk.decrypt(g.equals(a, b))) == int(x == y), (x, y)


def test_parity(setup):
    sk, g, keys = setup
    ks = jax.random.split(jax.random.key(11), 5)
    bits = [1, 1, 0, 1, 0]
    cts = [sk.encrypt(b, ks[i]) for i, b in enumerate(bits)]
    assert int(sk.decrypt(g.parity(cts))) == sum(bits) % 2


def test_matvec_f2(setup):
    import numpy as np

    from csgn_tpu.models.linear import matvec_f2

    sk, g, keys = setup
    bits = [1, 0, 1, 1]
    cts = [sk.encrypt(b, keys[i % 8]) for i, b in enumerate(bits)]
    M = np.array([[1, 1, 0, 0], [0, 1, 1, 1], [1, 1, 1, 1]])
    out = matvec_f2(M, cts)
    want = (M @ np.array(bits)) % 2
    got = [int(sk.decrypt(o)) for o in out]
    assert got == list(want)

    import pytest

    with pytest.raises(ValueError, match="selects no inputs"):
        matvec_f2(np.zeros((1, 4), dtype=int), cts)


def test_private_lookup(setup):
    import itertools

    import jax as _jax

    from csgn_tpu.models.lookup import private_lookup

    sk, g, keys = setup
    table = [1, 0, 1, 1]  # k = 2
    for addr in range(4):
        ks = _jax.random.split(_jax.random.key(500 + addr), 2)
        addr_bits = [sk.encrypt((addr >> j) & 1, ks[j]) for j in range(2)]
        out = private_lookup(g, addr_bits, table)
        assert int(sk.decrypt(out)) == table[addr], addr
