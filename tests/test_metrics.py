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


def test_timer():
    t = Timer("x")
    t.start()
    time.sleep(0.01)
    ms = t.stop()
    assert ms >= 5
    assert t.elapsed_ms == ms
