"""Bristol-Fashion netlists: parse/serialize, plain oracle, homomorphic paths."""

import random

import jax
import pytest

from csgn_tpu import SecretKey
from csgn_tpu.models import Gates
from csgn_tpu.models.netlist import (
    Gate,
    Netlist,
    adder,
    comparator_gt,
    equality,
    eval_expr,
    eval_homomorphic,
    eval_plain,
)


def _bits(x: int, width: int) -> list[int]:
    return [(x >> i) & 1 for i in range(width)]


def _from_bits(bits) -> int:
    return sum(int(b) << i for i, b in enumerate(bits))


# -- structure / format ---------------------------------------------------------


def test_parse_roundtrip():
    nl = adder(4)
    again = Netlist.parse(nl.to_text())
    assert again == nl
    assert again.n_inputs == 8 and again.n_outputs == 5
    assert again.and_count == nl.and_count


def test_parse_rejects_malformed():
    with pytest.raises(ValueError, match="header"):
        Netlist.parse("1 3\n1 1\n")
    good = adder(2).to_text()
    with pytest.raises(ValueError, match="header says"):
        Netlist.parse(good.replace(good.split()[0], "99", 1))


def test_validation_errors():
    with pytest.raises(ValueError, match="MAND"):
        Netlist(4, (2,), (1,), (Gate("MAND", (0, 1), 3),))
    with pytest.raises(ValueError, match="unknown gate"):
        Netlist(4, (2,), (1,), (Gate("NAND", (0, 1), 3),))
    with pytest.raises(ValueError, match="out of range"):
        Netlist(4, (2,), (1,), (Gate("XOR", (0, 9), 3),))
    with pytest.raises(ValueError, match="driven twice"):
        Netlist(
            4, (2,), (1,),
            (Gate("XOR", (0, 1), 3), Gate("AND", (0, 1), 3)),
        )
    with pytest.raises(ValueError, match="before any gate drives"):
        Netlist(5, (2,), (1,), (Gate("XOR", (0, 3), 4), Gate("AND", (0, 1), 3)))
    with pytest.raises(ValueError, match="never driven"):
        Netlist(4, (2,), (1,), ())
    with pytest.raises(ValueError, match="EQ takes one constant"):
        Netlist(4, (2,), (1,), (Gate("EQ", (7,), 3),))


# -- plain oracle vs python ints --------------------------------------------------


@pytest.mark.parametrize("width", [1, 4, 8, 16, 32])
def test_adder_plain(width):
    rng = random.Random(width)
    nl = adder(width)
    for _ in range(16):
        x, y = rng.randrange(1 << width), rng.randrange(1 << width)
        (out,) = eval_plain(nl, [_bits(x, width), _bits(y, width)])
        assert _from_bits(out) == x + y, (width, x, y)


@pytest.mark.parametrize("width", [1, 3, 8, 16])
def test_comparators_plain(width):
    rng = random.Random(width * 7)
    eq_nl, gt_nl = equality(width), comparator_gt(width)
    cases = [(0, 0), ((1 << width) - 1, (1 << width) - 1)] + [
        (rng.randrange(1 << width), rng.randrange(1 << width)) for _ in range(12)
    ]
    for x, y in cases:
        a, b = _bits(x, width), _bits(y, width)
        assert eval_plain(eq_nl, [a, b])[0][0] == int(x == y), (x, y)
        assert eval_plain(gt_nl, [a, b])[0][0] == int(x > y), (x, y)


def test_eq_const_and_eqw_gates():
    # out0 = const 1, out1 = const 0, out2 = copy of input.
    nl = Netlist(
        6, (1,), (3,),
        (
            Gate("EQ", (1,), 3),
            Gate("EQ", (0,), 4),
            Gate("EQW", (0,), 5),
        ),
    )
    for bit in (0, 1):
        (out,) = eval_plain(nl, [[bit]])
        assert out == [1, 0, bit]


def test_growth_accounting():
    nl = adder(4)
    g = nl.growth(input_chunks=1)
    # sum_i = 2 + carry_{i-1}, carry_i = 1 + 2*carry_{i-1}: doubles per bit.
    assert g == [2, 3, 5, 9, 15]
    assert max(adder(32).growth()) == 2**32 - 1  # why eval_expr exists
    with pytest.raises(ValueError, match="input chunk counts"):
        nl.growth(input_chunks=[1, 2, 3])


# -- homomorphic paths ------------------------------------------------------------


@pytest.fixture(scope="module")
def hom(small_ctx):
    keys = jax.random.split(jax.random.key(42), 4)
    sk = SecretKey.generate(small_ctx, keys[0])
    gates = Gates(sk.encrypt(1, keys[1]))
    return sk, gates, keys[2]


def _encrypt_bits(sk, x, width, key):
    ks = jax.random.split(key, width)
    return [sk.encrypt((x >> i) & 1, ks[i]) for i in range(width)]


def test_adder_homomorphic_materialized(hom):
    sk, gates, key = hom
    nl = adder(2)
    for x, y in [(0, 0), (1, 3), (2, 3), (3, 3)]:
        a = _encrypt_bits(sk, x, 2, jax.random.fold_in(key, 10 * x + y))
        b = _encrypt_bits(sk, y, 2, jax.random.fold_in(key, 100 + 10 * x + y))
        (out,) = eval_homomorphic(nl, [a, b], gates)
        got = _from_bits([int(sk.decrypt(ct)) for ct in out])
        assert got == x + y, (x, y, got)


def test_adder_expr_growth_free(hom):
    """32-bit adder: the carry-out would materialize to 2^32-1 chunks
    (beyond any chip's HBM); the CtExpr path decrypts from the 64 fresh
    leaves in O(64) chunk decrypts."""
    sk, gates, key = hom
    width = 32
    nl = adder(width)
    assert max(nl.growth()) > 4e9  # materializing would be absurd
    cases = [(3_000_000_200, 1_300_000_100), (2**32 - 1, 2**32 - 1), (0, 1)]
    for i, (x, y) in enumerate(cases):
        a = _encrypt_bits(sk, x, width, jax.random.fold_in(key, 2 * i))
        b = _encrypt_bits(sk, y, width, jax.random.fold_in(key, 2 * i + 1))
        (out,) = eval_expr(nl, [a, b], gates.one)
        got = _from_bits([int(sk.decrypt_circuit(e)) for e in out])
        assert got == x + y, (x, y, got)


def test_comparator_expr_matches_plain(hom):
    sk, gates, key = hom
    width = 6
    gt_nl = comparator_gt(width)
    for x, y in [(33, 12), (12, 33), (63, 63), (0, 63)]:
        a = _encrypt_bits(sk, x, width, jax.random.fold_in(key, 7 * x))
        b = _encrypt_bits(sk, y, width, jax.random.fold_in(key, 9000 + y))
        (out,) = eval_expr(gt_nl, [a, b], gates.one)
        assert int(sk.decrypt_circuit(out[0])) == int(x > y), (x, y)


def test_expr_and_materialized_agree(hom):
    sk, gates, key = hom
    nl = equality(3)
    for x, y in [(5, 5), (5, 4), (0, 7)]:
        a = _encrypt_bits(sk, x, 3, jax.random.fold_in(key, 31 * x))
        b = _encrypt_bits(sk, y, 3, jax.random.fold_in(key, 777 + y))
        (mat,) = eval_homomorphic(nl, [a, b], gates)
        (exp,) = eval_expr(nl, [a, b], gates.one)
        assert int(sk.decrypt(mat[0])) == int(sk.decrypt_circuit(exp[0])) == int(x == y)


def test_input_shape_errors(hom):
    sk, gates, key = hom
    nl = adder(2)
    one = [gates.one]
    with pytest.raises(ValueError, match="input values"):
        eval_plain(nl, [[0, 1]])
    with pytest.raises(ValueError, match="bits, header says"):
        eval_homomorphic(nl, [one, one + one], gates)


# -- batched evaluation ------------------------------------------------------------


def test_batched_matches_scalar_and_plain(hom):
    """One circuit over B input sets: eval_homomorphic_batch must be
    bit-identical (canonical form) to the per-request scalar path and
    decrypt to the plain oracle."""
    from csgn_tpu.batch import CiphertextBatch
    from csgn_tpu.models.netlist import eval_homomorphic_batch

    sk, gates, key = hom
    width = 3
    nl = comparator_gt(width)
    cases = [(5, 2), (2, 5), (7, 7), (0, 1), (6, 0)]
    enc_a = [
        _encrypt_bits(sk, x, width, jax.random.fold_in(key, 50 + i))
        for i, (x, _) in enumerate(cases)
    ]
    enc_b = [
        _encrypt_bits(sk, y, width, jax.random.fold_in(key, 90 + i))
        for i, (_, y) in enumerate(cases)
    ]
    a_w = [CiphertextBatch.stack([enc_a[i][j] for i in range(len(cases))])
           for j in range(width)]
    b_w = [CiphertextBatch.stack([enc_b[i][j] for i in range(len(cases))])
           for j in range(width)]
    (out_b,) = eval_homomorphic_batch(nl, [a_w, b_w], gates.one)
    assert out_b[0].batch == len(cases)
    for i, (x, y) in enumerate(cases):
        (out_s,) = eval_homomorphic(nl, [enc_a[i], enc_b[i]], gates)
        got_batch = out_b[0][i]
        assert int(sk.decrypt(got_batch)) == int(x > y), (x, y)
        import numpy as np
        assert np.array_equal(
            np.asarray(got_batch.canonical().wt),
            np.asarray(out_s[0].canonical().wt),
        ), f"batched element {i} != scalar path"


def test_fleet_expr_path_matches_scalar(hom):
    """CiphertextBatch wires through eval_expr: ONE DAG serves the fleet —
    decrypt_circuit returns uint8[B] equal to the per-instance scalar expr
    path (and to the plain oracle), with the scalar `one` constant mixing
    in by broadcast."""
    import numpy as np

    from csgn_tpu.batch import CiphertextBatch

    sk, gates, key = hom
    width = 3
    nl = comparator_gt(width)
    cases = [(5, 2), (2, 5), (7, 7), (0, 1), (6, 0)]
    enc_a = [
        _encrypt_bits(sk, x, width, jax.random.fold_in(key, 3000 + i))
        for i, (x, _) in enumerate(cases)
    ]
    enc_b = [
        _encrypt_bits(sk, y, width, jax.random.fold_in(key, 4000 + i))
        for i, (_, y) in enumerate(cases)
    ]
    a_w = [CiphertextBatch.stack([enc_a[i][j] for i in range(len(cases))])
           for j in range(width)]
    b_w = [CiphertextBatch.stack([enc_b[i][j] for i in range(len(cases))])
           for j in range(width)]
    (out,) = eval_expr(nl, [a_w, b_w], gates.one)
    got = sk.decrypt_circuit(out[0])
    assert isinstance(got, np.ndarray) and got.dtype == np.uint8
    assert got.tolist() == [int(x > y) for x, y in cases]
    # decrypt_circuits agrees and returns the same array type
    (got2,) = sk.decrypt_circuits([out[0]])
    assert np.array_equal(got2, got)
    # per-instance scalar expr path agrees bit for bit
    for i, (x, y) in enumerate(cases):
        (o_s,) = eval_expr(nl, [enc_a[i], enc_b[i]], gates.one)
        assert int(sk.decrypt_circuit(o_s[0])) == int(got[i]), (x, y)


def test_batched_input_validation(hom):
    from csgn_tpu.batch import CiphertextBatch
    from csgn_tpu.models.netlist import eval_homomorphic_batch

    sk, gates, key = hom
    nl = equality(2)
    cts = _encrypt_bits(sk, 2, 2, key)
    b1 = CiphertextBatch.stack([cts[0], cts[1]])
    b2 = CiphertextBatch.stack([cts[0]])
    with pytest.raises(TypeError, match="CiphertextBatch"):
        eval_homomorphic_batch(nl, [[cts[0], cts[1]], [cts[0], cts[1]]], gates.one)
    with pytest.raises(ValueError, match="batch mismatch"):
        eval_homomorphic_batch(nl, [[b1, b1], [b1, b2]], gates.one)


def test_materialization_budget_guard(hom):
    """A deep circuit submitted to the materialized paths must fail FAST
    with a message pointing at the growth-free routes — not allocate its
    way to an OOM.  peak_chunks saturates instead of hanging."""
    from csgn_tpu.models.aes import aes128

    sk, gates, key = hom
    nl = aes128()
    assert nl.peak_chunks() == 2**63  # saturated, computed in ~0.1 s
    one = gates.one
    enc_in = [[one] * 128, [one] * 128]
    with pytest.raises(ValueError, match="eval_expr"):
        eval_homomorphic(nl, enc_in, gates, budget_bytes=14 * 2**30)
    from csgn_tpu.batch import CiphertextBatch
    from csgn_tpu.models.netlist import eval_homomorphic_batch

    b1 = CiphertextBatch.stack([one])
    with pytest.raises(ValueError, match="submit_netlist_expr"):
        eval_homomorphic_batch(nl, [[b1] * 128, [b1] * 128], one,
                               budget_bytes=14 * 2**30)
    # ...and the executor's materialized route rejects it at flush.
    from csgn_tpu import BatchExecutor

    ex = BatchExecutor(sk, rng=jax.random.key(77))
    fut = ex.submit_netlist(nl, enc_in)
    with pytest.raises(ValueError, match="growth-free"):
        fut.result()
    # ...and the knob the error message points at is reachable from the
    # executor API (None disables the guard for a SHALLOW circuit here —
    # never actually evaluate AES materialized).
    ex2 = BatchExecutor(sk, rng=jax.random.key(78), netlist_budget_bytes=None)
    shallow = equality(2)
    (out,) = ex2.submit_netlist(shallow, [[gates.one, gates.one],
                                          [gates.one, gates.one]]).result()
    assert int(sk.decrypt(out[0])) == 1


def test_fuzz_random_netlists_all_paths_agree(hom):
    """Random small circuits: eval_plain (oracle), materialized, expr,
    batched-materialized, and fleet-expr must all decrypt identically.
    Gate count kept small so materialized growth stays cheap."""
    import numpy as np

    from csgn_tpu.batch import CiphertextBatch
    from csgn_tpu.models.netlist import _Builder, eval_homomorphic_batch

    sk, gates, key = hom
    rnd = random.Random(0xF022)
    B = 3
    for trial in range(4):
        n_in = rnd.randint(2, 4)
        b = _Builder([n_in])
        live = list(range(n_in))
        n_ands = 0
        for _ in range(rnd.randint(3, 9)):
            op = rnd.choice(["XOR", "XOR", "AND", "INV", "EQW", "EQ"])
            if op == "AND" and n_ands >= 3:
                op = "XOR"  # bound materialized growth
            if op == "XOR":
                live.append(b.xor(rnd.choice(live), rnd.choice(live)))
            elif op == "AND":
                live.append(b.and_(rnd.choice(live), rnd.choice(live)))
                n_ands += 1
            elif op == "INV":
                live.append(b.inv(rnd.choice(live)))
            elif op == "EQW":
                live.append(b.emit("EQW", rnd.choice(live)))
            else:
                live.append(b.emit("EQ", rnd.randint(0, 1)))
        outs = [rnd.choice(live), rnd.choice(live)]
        nl = b.finish(outs, [2])

        insts = [[rnd.randint(0, 1) for _ in range(n_in)] for _ in range(B)]
        enc = [
            [sk.encrypt(bit, jax.random.fold_in(key, 10_000 * trial + 100 * i + j))
             for j, bit in enumerate(bits)]
            for i, bits in enumerate(insts)
        ]
        plain = [eval_plain(nl, [bits])[0] for bits in insts]
        # packed evaluation (the serving route's engine) matches per instance
        from csgn_tpu.models.netlist import eval_plain_packed

        packed_in = [[sum(insts[i][j] << i for i in range(B)) for j in range(n_in)]]
        (packed_out,) = eval_plain_packed(nl, packed_in, B)
        for i in range(B):
            assert [(v >> i) & 1 for v in packed_out] == plain[i], (trial, i)
        # materialized + expr, per instance
        for i in range(B):
            (mat,) = eval_homomorphic(nl, [enc[i]], gates)
            (exp,) = eval_expr(nl, [enc[i]], gates.one)
            got_m = [int(sk.decrypt(ct)) for ct in mat]
            got_e = [int(v) for v in sk.decrypt_circuits(exp)]
            assert got_m == got_e == plain[i], (trial, i, nl.to_text())
        # batched-materialized + fleet-expr, whole fleet at once
        wires = [
            CiphertextBatch.stack([enc[i][j] for i in range(B)])
            for j in range(n_in)
        ]
        (mat_b,) = eval_homomorphic_batch(nl, [wires], gates.one)
        (exp_b,) = eval_expr(nl, [wires], gates.one)
        fleet_bits = sk.decrypt_circuits(exp_b)
        for i in range(B):
            got_mb = [int(sk.decrypt(cb[i])) for cb in mat_b]
            got_fb = [
                int(v[i]) if isinstance(v, np.ndarray) else int(v)
                for v in fleet_bits
            ]
            assert got_mb == got_fb == plain[i], (trial, i, nl.to_text())


# -- published-format files from disk ---------------------------------------------

import pathlib

_CIRCUITS = pathlib.Path(__file__).parent / "circuits"


def test_adder64_file_from_disk(hom):
    """Standard-suite adder64 interface (2x64 -> 64, little-endian, blank
    header line, outputs on jumped final wires): parse from disk, check the
    plain oracle over random pairs, and decrypt one homomorphic evaluation
    end-to-end via the growth-free expr path (materialized growth of the top
    bit exceeds 2^60 chunks)."""
    nl = Netlist.parse((_CIRCUITS / "adder64.txt").read_text())
    assert nl.n_inputs == 128 and nl.output_sizes == (64,)
    assert nl.and_count == 125
    rnd = random.Random(7)
    for _ in range(25):
        x, y = rnd.getrandbits(64), rnd.getrandbits(64)
        (out,) = eval_plain(nl, [_bits(x, 64), _bits(y, 64)])
        assert _from_bits(out) == (x + y) % 2**64, (x, y)
    assert max(nl.growth()) > 2**60

    sk, gates, key = hom
    x, y = rnd.getrandbits(64), rnd.getrandbits(64)
    a = _encrypt_bits(sk, x, 64, jax.random.fold_in(key, 640))
    b = _encrypt_bits(sk, y, 64, jax.random.fold_in(key, 641))
    (out,) = eval_expr(nl, [a, b], gates.one)
    got = _from_bits([int(sk.decrypt_circuit(e)) for e in out])
    assert got == (x + y) % 2**64


def test_gt32_file_from_disk(hom):
    """Comparator fixture: INV gates, single jumped output wire."""
    nl = Netlist.parse((_CIRCUITS / "gt32.txt").read_text())
    assert nl.n_inputs == 64 and nl.output_sizes == (1,)
    rnd = random.Random(11)
    cases = [(rnd.getrandbits(32), rnd.getrandbits(32)) for _ in range(25)]
    cases += [(5, 5), (0, 0), (2**32 - 1, 0), (0, 2**32 - 1)]
    for x, y in cases:
        (out,) = eval_plain(nl, [_bits(x, 32), _bits(y, 32)])
        assert out[0] == int(x > y), (x, y)

    sk, gates, key = hom
    for i, (x, y) in enumerate([(77, 12), (12, 77)]):
        a = _encrypt_bits(sk, x, 32, jax.random.fold_in(key, 700 + i))
        b = _encrypt_bits(sk, y, 32, jax.random.fold_in(key, 800 + i))
        (out,) = eval_expr(nl, [a, b], gates.one)
        assert int(sk.decrypt_circuit(out[0])) == int(x > y)


def test_mand_file_rejected_loudly():
    """Extended-format MAND (multi-output) must fail with an explicit MAND
    message, not a generic parse error."""
    with pytest.raises(ValueError, match="MAND"):
        Netlist.parse((_CIRCUITS / "mand3.txt").read_text())
    # ...and a single-output MAND line is rejected by circuit validation.
    with pytest.raises(ValueError, match="MAND"):
        Netlist.parse("1 3\n1 2\n1 1\n\n2 1 0 1 2 MAND\n")


def test_mand_expansion_opt_in():
    """parse(expand_mand=True) rewrites each extended-format MAND line into
    k 2-input ANDs (out_j = in_j & in_{k+j}) and evaluates correctly."""
    nl = Netlist.parse((_CIRCUITS / "mand3.txt").read_text(), expand_mand=True)
    assert nl.and_count == 2 and nl.n_outputs == 3
    for a0, a1, b0, b1 in [(1, 0, 1, 1), (0, 1, 1, 1), (1, 1, 0, 1), (0, 0, 0, 0)]:
        (out,) = eval_plain(nl, [[a0, a1], [b0, b1]])
        assert out == [a0 & b0, a1 & b1, a0 ^ b0], (a0, a1, b0, b1)
    with pytest.raises(ValueError, match="2x as many inputs"):
        Netlist.parse("1 5\n1 3\n1 1\n\n3 2 0 1 2 3 4 MAND\n", expand_mand=True)


def test_random_netlists_batched_equals_scalar():
    """Property: random valid netlists evaluate identically on the plain,
    scalar-homomorphic, batched, and expr paths."""
    import random as _random

    import numpy as np

    from csgn_tpu.batch import CiphertextBatch
    from csgn_tpu.context import Context
    from csgn_tpu.models import Gates
    from csgn_tpu.models.netlist import (
        Netlist, _Builder, eval_expr, eval_homomorphic,
        eval_homomorphic_batch, eval_plain,
    )
    from csgn_tpu.secret_key import SecretKey

    ctx = Context(95, 4)
    sk = SecretKey.generate(ctx, jax.random.key(77))
    gates = Gates(sk.encrypt(1, jax.random.key(78)))
    rnd = _random.Random(5)
    for trial in range(4):
        n_in = rnd.randint(2, 4)
        b = _Builder([n_in])
        live = list(range(n_in))
        for _ in range(rnd.randint(3, 7)):
            op = rnd.choice(["XOR", "AND", "INV"])
            if op == "INV":
                live.append(b.inv(rnd.choice(live)))
            else:
                live.append(b.emit(op, rnd.choice(live), rnd.choice(live)))
        nl = b.finish([live[-1], rnd.choice(live)], [2])
        nl = Netlist.parse(nl.to_text())  # roundtrip through the format
        B = 3
        cases = [[rnd.randint(0, 1) for _ in range(n_in)] for _ in range(B)]
        enc = [
            [sk.encrypt(bit, jax.random.fold_in(jax.random.key(trial), 10 * i + j))
             for j, bit in enumerate(row)]
            for i, row in enumerate(cases)
        ]
        wires = [CiphertextBatch.stack([enc[i][j] for i in range(B)])
                 for j in range(n_in)]
        (out_b,) = eval_homomorphic_batch(nl, [wires], gates.one)
        for i in range(B):
            (plain,) = eval_plain(nl, [cases[i]])
            (mat,) = eval_homomorphic(nl, [enc[i]], gates)
            (exp,) = eval_expr(nl, [enc[i]], gates.one)
            for k in range(2):
                assert int(sk.decrypt(out_b[k][i])) == plain[k]
                assert int(sk.decrypt(mat[k])) == plain[k]
                assert int(sk.decrypt_circuit(exp[k])) == plain[k]
                assert np.array_equal(
                    np.asarray(out_b[k][i].canonical().wt),
                    np.asarray(mat[k].canonical().wt),
                )


def test_single_output_mand_expands():
    nl = Netlist.parse("1 3\n1 2\n1 1\n\n2 1 0 1 2 MAND\n", expand_mand=True)
    assert [g.op for g in nl.gates] == ["AND"]
    assert eval_plain(nl, [[1, 1]]) == [[1]]
    assert eval_plain(nl, [[1, 0]]) == [[0]]


def test_aes_sbox_file_from_disk(hom):
    """AES S-box fixture (GF(2^8) inversion + affine, 256 ANDs): all 256
    plain evaluations match an INDEPENDENTLY constructed log/antilog table
    (different algorithm than the circuit's square-multiply chain), the
    FIPS-197 anchors hold, and a homomorphic expr evaluation decrypts to
    the right byte."""
    nl = Netlist.parse((_CIRCUITS / "aes_sbox.txt").read_text())
    assert nl.input_sizes == (8,) and nl.output_sizes == (8,)
    assert nl.and_count == 256  # 4 GF multiplications x 64 bit-products

    def xtime(a):
        return ((a << 1) ^ 0x11B) & 0xFF if a & 0x80 else (a << 1) & 0xFF

    def gmul(a, b):
        r = 0
        while b:
            if b & 1:
                r ^= a
            a, b = xtime(a), b >> 1
        return r

    exp = [1] * 256
    for i in range(1, 256):
        exp[i] = gmul(exp[i - 1], 3)
    log = {exp[i]: i for i in range(255)}

    def sbox_ref(x):
        inv = 0 if x == 0 else exp[255 - log[x]]
        b = 0
        for i in range(8):
            bit = (
                (inv >> i) ^ (inv >> ((i + 4) % 8)) ^ (inv >> ((i + 5) % 8))
                ^ (inv >> ((i + 6) % 8)) ^ (inv >> ((i + 7) % 8)) ^ (0x63 >> i)
            ) & 1
            b |= bit << i
        return b

    assert sbox_ref(0x00) == 0x63 and sbox_ref(0x01) == 0x7C
    assert sbox_ref(0x53) == 0xED  # FIPS-197 worked example
    for x in range(256):
        (out,) = eval_plain(nl, [_bits(x, 8)])
        assert _from_bits(out) == sbox_ref(x), hex(x)

    sk, gates, key = hom
    for x in (0x00, 0x53, 0xA7):
        enc = _encrypt_bits(sk, x, 8, jax.random.fold_in(key, 0x5B0 + x))
        (outs,) = eval_expr(nl, [enc], gates.one)
        got = _from_bits([int(v) for v in sk.decrypt_circuits(outs)])
        assert got == sbox_ref(x), hex(x)
