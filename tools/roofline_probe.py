"""Probe achievable HBM bandwidth + dispatch overhead on this chip.

Device-chained iterations (lax.fori_loop with a data dependency) remove host
dispatch from the measurement.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from csgn_tpu.context import Context
from csgn_tpu.ops import core, kernels

ITERS = 50


def device_time(fn, *args, iters=ITERS):
    """fn(carry, *rest) -> carry, chained on device; returns secs/iter."""
    @jax.jit
    def loop(c, *rest):
        def body(i, c):
            return fn(c, i, *rest)
        return jax.lax.fori_loop(0, iters, body, c)

    c0 = args[0]
    out = jax.block_until_ready(loop(c0, *args[1:]))  # compile+warm
    t0 = time.perf_counter()
    out = jax.block_until_ready(loop(c0, *args[1:]))
    return (time.perf_counter() - t0) / iters


def main():
    print("backend:", jax.default_backend())
    ctx = Context(1247, 16)
    W = ctx.words32
    rng = np.random.default_rng(0)

    # 1. Pure copy roofline: y = x ^ i  (read + write N bytes)
    for mb in [64, 256, 1024]:
        n = mb * 1024 * 1024 // 4
        x = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
        t = device_time(lambda c, i: c ^ i.astype(jnp.uint32), x)
        print(f"xor-copy {mb} MB: {t*1e3:.3f} ms -> {2*mb/1024/t:.0f} GB/s (r+w)")

    # 2. Decrypt-style reduce: read-only traffic
    mask = jnp.asarray(rng.integers(0, 2**32, W, dtype=np.uint32))
    for chunks in [2**20, 2**22]:
        x = jnp.asarray(rng.integers(0, 2**32, (chunks, W), dtype=np.uint32))
        def dec_step(c, i, m):
            out = core.decrypt_parity(c, m, 16)
            return c.at[0, 0].set(out + i.astype(jnp.uint32))
        t = device_time(dec_step, x, mask)
        gb = chunks * W * 4 / 1e9
        print(f"xla dec {chunks} chunks ({gb:.2f} GB): {t*1e3:.3f} ms -> {gb/t:.0f} GB/s")

    # 3. XLA mul scaling
    for t1, t2 in [(1024, 1024), (2048, 2048)]:
        a = jnp.asarray(rng.integers(0, 2**32, (t1, W), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2**32, (t2, W), dtype=np.uint32))
        def mul_step(c, i, b):
            out = core.mul_chunks(c, b)
            return c ^ out[: c.shape[0]]
        t = device_time(mul_step, a, b)
        gb = t1 * t2 * W * 4 / 1e9
        print(f"xla mul {t1}x{t2} ({gb:.2f} GB out): {t*1e3:.3f} ms -> {gb/t:.0f} GB/s write")

    # 4. Dispatch overhead: tiny op, host-timed singles
    x = jnp.zeros((8, 128), jnp.uint32)
    f = jax.jit(lambda x: x ^ 1)
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    for _ in range(100):
        out = f(x)
    jax.block_until_ready(out)
    print(f"dispatch (async queue of tiny op): {(time.perf_counter()-t0)/100*1e6:.0f} us/op")
    t0 = time.perf_counter()
    for _ in range(20):
        jax.block_until_ready(f(x))
    print(f"dispatch (sync round-trip): {(time.perf_counter()-t0)/20*1e6:.0f} us/op")


if __name__ == "__main__":
    main()
