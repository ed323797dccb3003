"""BatchExecutor: microbatched serving matches the unbatched ops exactly."""

import jax
import pytest

from csgn_tpu import BatchExecutor, Permutation, SecretKey


@pytest.fixture(scope="module")
def sk(small_ctx):
    return SecretKey.generate(small_ctx, jax.random.key(3))


@pytest.fixture()
def ex(sk):
    return BatchExecutor(sk, rng=jax.random.key(9))


def _enc(sk, bits, seed=0):
    ks = jax.random.split(jax.random.key(100 + seed), len(bits))
    return [sk.encrypt(b, ks[i]) for i, b in enumerate(bits)]


def test_encrypt_then_decrypt_roundtrip(ex, sk):
    bits = [1, 0, 1, 1, 0, 0, 1]
    futs = [ex.submit_encrypt(b) for b in bits]
    assert ex.pending() == len(bits)
    cts = [f.result() for f in futs]  # result() forces the flush
    assert ex.pending() == 0
    dec = [ex.submit_decrypt(ct) for ct in cts]
    ex.flush()
    assert [f.result() for f in dec] == bits
    # encrypts grouped into one dispatch, decrypts into another
    assert ex.stats["group_dispatches"] == 2
    assert ex.stats["requests"] == 2 * len(bits)


def test_encrypt_deterministic_given_rng_and_order(sk):
    runs = []
    for _ in range(2):
        ex = BatchExecutor(sk, rng=jax.random.key(5))
        futs = [ex.submit_encrypt(b) for b in (1, 0, 1)]
        ex.flush()
        runs.append([f.result().to_u64().tobytes() for f in futs])
    assert runs[0] == runs[1]


def test_mul_add_match_unbatched(ex, sk):
    a = _enc(sk, [1, 0, 1, 1], seed=1)
    b = _enc(sk, [1, 1, 0, 1], seed=2)
    muls = [ex.submit_mul(x, y) for x, y in zip(a, b)]
    adds = [ex.submit_add(x, y) for x, y in zip(a, b)]
    ex.flush()
    for x, y, fm, fa in zip(a, b, muls, adds):
        want_mul = int(sk.decrypt(x * y))
        want_add = int(sk.decrypt(x + y))
        assert int(sk.decrypt(fm.result())) == want_mul
        assert int(sk.decrypt(fa.result())) == want_add


def test_mixed_shapes_group_separately(ex, sk):
    a, b, c = _enc(sk, [1, 1, 1], seed=3)
    grown = a + b  # 2 chunks
    f1 = ex.submit_mul(a, b)          # (1,1)
    f2 = ex.submit_mul(grown, c)      # (2,1)
    f3 = ex.submit_mul(a, c)          # (1,1) — joins f1's group
    ex.flush()
    assert ex.stats["group_dispatches"] == 2
    assert int(sk.decrypt(f1.result())) == 1
    assert int(sk.decrypt(f2.result())) == 0  # parity of a+b is 1^1=0, AND c -> 0
    assert int(sk.decrypt(f3.result())) == 1


def test_mul_decrypt_fused_matches_staged(ex, sk):
    a = _enc(sk, [1, 1, 0, 1], seed=4)
    b = _enc(sk, [1, 0, 0, 1], seed=5)
    grown = [x + y for x, y in zip(a, b)]  # 2-chunk operands
    futs = [ex.submit_mul_decrypt(x, g) for x, g in zip(a, grown)]
    ex.flush()
    for x, g, f in zip(a, grown, futs):
        prod, bit = f.result()
        assert bit == int(sk.decrypt(x * g))
        assert int(sk.decrypt(prod)) == bit


def test_permute_fleet_matches_single(ex, sk, small_ctx):
    import numpy as np

    rng = np.random.default_rng(0)
    cts = _enc(sk, [1, 1, 1, 0], seed=6)
    perms = [
        Permutation(np.asarray(rng.permutation(small_ctx.n), dtype=np.int32))
        for _ in cts
    ]
    futs = [ex.submit_permute(ct, p) for ct, p in zip(cts, perms)]
    ex.flush()
    assert ex.stats["group_dispatches"] == 1
    for ct, p, f in zip(cts, perms, futs):
        want = ct.apply_permutation(p)
        got = f.result()
        assert got.to_u64().tobytes() == want.to_u64().tobytes()


def test_lazy_tagged_results_recirculate(ex, sk):
    """Products carry lazy order tags; feeding them back must still group."""
    a = _enc(sk, [1, 1], seed=7)
    b = _enc(sk, [1, 1], seed=8)
    g1, g2 = a[0] + b[0], a[1] + b[1]
    m = [ex.submit_mul(g1, g2), ex.submit_mul(g2, g1)]
    ex.flush()
    p1, p2 = m[0].result(), m[1].result()
    d = [ex.submit_decrypt(p1), ex.submit_decrypt(p2)]
    ex.flush()
    want = int(sk.decrypt(g1 * g2))
    assert d[0].result() == want and d[1].result() == want


def test_max_batch_autoflush(sk):
    ex = BatchExecutor(sk, rng=jax.random.key(1), max_batch=4)
    futs = [ex.submit_encrypt(1) for _ in range(4)]
    # group hit max_batch -> flushed without an explicit flush()
    assert ex.pending() == 0
    assert all(f.done for f in futs)
    assert ex.stats["group_dispatches"] == 1


def test_submit_errors(sk, small_ctx):
    import numpy as np

    from csgn_tpu import Context

    ex = BatchExecutor()  # keyless
    with pytest.raises(ValueError, match="need a BatchExecutor"):
        ex.submit_encrypt(1)
    ct = _enc(sk, [1])[0]
    with pytest.raises(ValueError, match="need a BatchExecutor"):
        ex.submit_decrypt(ct)

    keyed = BatchExecutor(sk)
    other_ctx = Context(small_ctx.n + 2, small_ctx.d)
    other_sk = SecretKey.generate(other_ctx, jax.random.key(4))
    foreign = other_sk.encrypt(1, jax.random.key(5))
    with pytest.raises(ValueError, match="context differs"):
        keyed.submit_decrypt(foreign)
    with pytest.raises(TypeError, match="expects Ciphertext"):
        keyed.submit_mul(ct, 1)
    with pytest.raises(ValueError, match="permutation length"):
        keyed.submit_permute(
            ct, Permutation(np.arange(small_ctx.n - 1, dtype=np.int32))
        )


def test_group_failure_delivered_via_futures(sk, monkeypatch):
    ex = BatchExecutor(sk)
    f1, f2 = ex.submit_encrypt(1), ex.submit_encrypt(0)
    monkeypatch.setattr(
        type(sk), "encrypt_batch",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("device fell over")),
    )
    ex.flush()
    for f in (f1, f2):
        assert f.done
        with pytest.raises(RuntimeError, match="device fell over"):
            f.result()


def test_netlist_requests_batch_into_one_group(ex, sk):
    """B same-circuit requests = one group dispatch; results match the plain
    oracle and the direct scalar evaluation."""
    from csgn_tpu.models import Gates
    from csgn_tpu.models.netlist import comparator_gt, eval_homomorphic, eval_plain

    width = 3
    nl = comparator_gt(width)
    cases = [(5, 1), (1, 5), (4, 4), (7, 0)]
    reqs = []
    for i, (x, y) in enumerate(cases):
        a = _enc(sk, [(x >> j) & 1 for j in range(width)], seed=10 + i)
        b = _enc(sk, [(y >> j) & 1 for j in range(width)], seed=40 + i)
        reqs.append((a, b))
    futs = [ex.submit_netlist(nl, [a, b]) for a, b in reqs]
    assert ex.pending() == len(cases)
    before = ex.stats["group_dispatches"]
    ex.flush()
    assert ex.stats["group_dispatches"] == before + 1  # ONE batched evaluation
    for f, (x, y) in zip(futs, cases):
        (out,) = f.result()
        assert int(sk.decrypt(out[0])) == int(x > y), (x, y)


def test_netlist_reproducible_and_guarded(sk, small_ctx):
    from csgn_tpu import BatchExecutor
    from csgn_tpu.models.netlist import equality

    nl = equality(2)
    a = _enc(sk, [1, 0], seed=77)
    b = _enc(sk, [1, 0], seed=78)

    outs = []
    for _ in range(2):
        e = BatchExecutor(sk, rng=jax.random.key(123))
        (out,) = e.submit_netlist(nl, [a, b]).result()
        outs.append(out[0].canonical())
    import numpy as np
    assert np.array_equal(np.asarray(outs[0].wt), np.asarray(outs[1].wt))

    keyless = BatchExecutor()
    with pytest.raises(ValueError, match="need a BatchExecutor"):
        keyless.submit_netlist(nl, [a, b])
    keyed = BatchExecutor(sk)
    with pytest.raises(TypeError, match="expected Netlist"):
        keyed.submit_netlist("nope", [a, b])
    with pytest.raises(ValueError, match="bits, header says"):
        keyed.submit_netlist(nl, [a[:1], b])


def test_netlist_expr_fleet_route(ex, sk):
    """submit_netlist_expr: B deep-circuit requests = ONE group dispatch,
    one fleet DAG, bits match the plain oracle.  adder(8)'s top carries
    would materialize ~2^8-scale growth per request — the expr route never
    materializes anything."""
    from csgn_tpu.models.netlist import adder, eval_plain

    width = 8
    nl = adder(width)
    cases = [(200, 100), (255, 255), (0, 1), (17, 4)]
    reqs = []
    for i, (x, y) in enumerate(cases):
        a = _enc(sk, [(x >> j) & 1 for j in range(width)], seed=500 + i)
        b = _enc(sk, [(y >> j) & 1 for j in range(width)], seed=540 + i)
        reqs.append((a, b))
    futs = [ex.submit_netlist_expr(nl, [a, b]) for a, b in reqs]
    before = ex.stats["group_dispatches"]
    ex.flush()
    assert ex.stats["group_dispatches"] == before + 1  # ONE fleet DAG flush
    for f, (x, y) in zip(futs, cases):
        (out_bits,) = f.result()
        got = sum(bit << j for j, bit in enumerate(out_bits))
        assert got == x + y, (x, y, got)
        (plain,) = eval_plain(
            nl,
            [[(x >> j) & 1 for j in range(width)], [(y >> j) & 1 for j in range(width)]],
        )
        assert out_bits == plain

    keyless = BatchExecutor()
    with pytest.raises(ValueError, match="need a BatchExecutor"):
        keyless.submit_netlist_expr(nl, [reqs[0][0], reqs[0][1]])


def test_decrypt_circuit_requests_group(ex, sk):
    """Expr-decrypt requests flush as one decrypt_circuits call; results
    match per-expr decryption and a plain Ciphertext submits fine too."""
    from csgn_tpu.models.netlist import equality, eval_expr

    nl = equality(2)
    one = _enc(sk, [1], seed=300)[0]
    exprs = []
    cases = [(2, 2), (2, 1), (3, 3), (0, 3)]
    for i, (x, y) in enumerate(cases):
        a = _enc(sk, [(x >> j) & 1 for j in range(2)], seed=310 + i)
        b = _enc(sk, [(y >> j) & 1 for j in range(2)], seed=350 + i)
        exprs.append(eval_expr(nl, [a, b], one)[0][0])
    futs = [ex.submit_decrypt_circuit(e) for e in exprs]
    futs.append(ex.submit_decrypt_circuit(one))  # plain Ciphertext leaf
    before = ex.stats["group_dispatches"]
    ex.flush()
    assert ex.stats["group_dispatches"] == before + 1
    got = [f.result() for f in futs]
    assert got == [int(x == y) for x, y in cases] + [1]

    import pytest as _p
    with _p.raises(TypeError, match="CtExpr or Ciphertext"):
        ex.submit_decrypt_circuit(42)

