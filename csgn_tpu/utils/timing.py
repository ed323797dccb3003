"""Timing: stopwatch (reference Timer parity) + device-honest measurement.

The reference's only observability is a chrono stopwatch
(reference src/Timer.{h,cpp}); `Timer` reproduces that surface.
`device_median_time` is the framework's honest device-timing primitive: on
remote-tunnel TPU setups, `block_until_ready` can return before execution
completes, so timings are taken around a 4-byte device->host scalar fetch and
corrected by a measured round-trip baseline (methodology validated in
docs/performance.md).
"""

from __future__ import annotations

import time

import numpy as np

__all__ = ["Timer", "device_median_time", "measure_rtt"]


class Timer:
    """Stopwatch with ms resolution (reference src/Timer.cpp:21-48 parity)."""

    def __init__(self, name: str = ""):
        self.name = name
        self._t0: float | None = None
        self._elapsed_ms = 0.0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        """Stop and return elapsed milliseconds since start()."""
        if self._t0 is None:
            raise RuntimeError("Timer.stop() without start()")
        self._elapsed_ms = (time.perf_counter() - self._t0) * 1e3
        self._t0 = None
        return self._elapsed_ms

    def stop_and_print(self) -> float:
        ms = self.stop()
        print(f"{self.name}: {ms:.3f} ms")
        return ms

    @property
    def elapsed_ms(self) -> float:
        return self._elapsed_ms


def measure_rtt(reps: int = 7) -> float:
    """Median seconds for a trivial dispatch + 4-byte fetch (tunnel RTT)."""
    import jax
    import jax.numpy as jnp

    z = jnp.zeros((8,), jnp.uint32)
    f = jax.jit(lambda z: z.sum())
    np.asarray(f(z))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(z))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[reps // 2]


def device_median_time(fetch, reps: int = 7, rtt: float | None = None) -> float:
    """Median seconds of fetch() (must end in a small device->host transfer),
    minus the dispatch round-trip baseline."""
    if rtt is None:
        rtt = measure_rtt()
    fetch()  # warm/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch()
        ts.append(time.perf_counter() - t0)
    return max(sorted(ts)[reps // 2] - rtt, 1e-9)
