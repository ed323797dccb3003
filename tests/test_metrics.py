"""Structured metrics + Timer surface."""

import time

from csgn_tpu.utils import OpMetrics, Timer


def test_op_metrics_accumulate():
    m = OpMetrics()
    with m.record("mul", chunks_in=10, chunks_out=100, bytes_moved=4000):
        pass
    with m.record("mul", chunks_in=5, chunks_out=25, bytes_moved=1000):
        pass
    snap = m.snapshot()
    assert snap["mul"]["calls"] == 2
    assert snap["mul"]["chunks_out"] == 125
    assert snap["mul"]["bytes_moved"] == 5000
    assert "GBps" in snap["mul"]
    assert "mul" in m.format_table()
    m.reset()
    assert m.snapshot() == {}


def test_production_ops_record_metrics(ctx, rng):
    """The public operator path must feed the global metrics (SURVEY §5:
    per-op observability of the production path, not a standalone class)."""
    import jax

    from csgn_tpu import Permutation, SecretKey
    from csgn_tpu.utils.metrics import op_metrics

    m = op_metrics()
    m.reset()
    sk = SecretKey.generate(ctx, rng)
    c1 = sk.encrypt(1, jax.random.fold_in(rng, 1))
    c0 = sk.encrypt(0, jax.random.fold_in(rng, 2))
    ct = (c1 + c0) * c1
    ct = ct.apply_permutation(Permutation.random(ctx, jax.random.fold_in(rng, 3)))
    sk.decrypt(ct)
    snap = m.snapshot()
    assert snap["key.encrypt"]["calls"] == 2
    assert snap["ct.add"]["chunks_out"] == 2
    assert snap["ct.mul"]["chunks_out"] == 2
    assert snap["ct.permute"]["calls"] == 1
    assert snap["key.decrypt"]["chunks_in"] == 2
    assert any(k.startswith("dispatch.") for k in snap), snap.keys()
    assert all(s["bytes_moved"] > 0 for k, s in snap.items()
               if k.startswith(("ct.", "key.")))
    m.reset()


def test_sharded_ops_record_metrics(ctx, rng):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from csgn_tpu import SecretKey
    from csgn_tpu.parallel import chunk_mesh
    from csgn_tpu.parallel.ops import sharded_decrypt_parity, sharded_mul_allgather
    from csgn_tpu.utils.metrics import op_metrics

    m = op_metrics()
    m.reset()
    mesh = chunk_mesh(4)
    sk = SecretKey.generate(ctx, rng)
    words = sk.encrypt_batch(jnp.asarray(np.arange(8) % 2, dtype=jnp.uint8), rng)
    prod = sharded_mul_allgather(words, words, mesh)
    sharded_decrypt_parity(prod, jnp.asarray(sk.mask), mesh)
    snap = m.snapshot()
    assert snap["sharded.mul_allgather"]["chunks_out"] == 64
    assert snap["sharded.decrypt"]["chunks_in"] == 64
    m.reset()


def test_timer():
    t = Timer("x")
    t.start()
    time.sleep(0.01)
    ms = t.stop()
    assert ms >= 5
    assert t.elapsed_ms == ms
