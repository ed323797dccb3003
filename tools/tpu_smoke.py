"""TPU smoke test + microbench for the Pallas kernels (run on the real chip).

Usage: python tools/tpu_smoke.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from csgn_tpu.context import Context
from csgn_tpu.ops import core, kernels
from csgn_tpu.secret_key import SecretKey


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    print("backend:", jax.default_backend(), jax.devices())
    ctx = Context(1247, 16)
    rng = np.random.default_rng(0)
    sk = SecretKey.generate(ctx, jax.random.key(0))
    mask = jnp.asarray(sk.mask)

    for t1, t2 in [(128, 128), (1024, 1024)]:
        a = jnp.asarray(rng.integers(0, 2**32, (t1, ctx.words32), dtype=np.uint32) & ctx.valid_mask)
        b = jnp.asarray(rng.integers(0, 2**32, (t2, ctx.words32), dtype=np.uint32) & ctx.valid_mask)

        jit_core_mul = jax.jit(core.mul_chunks)
        got_k = kernels.mul_chunks_pallas(a, b)
        got_c = jit_core_mul(a, b)
        assert np.array_equal(np.asarray(got_k), np.asarray(got_c)), "mul mismatch!"

        out_bytes = t1 * t2 * ctx.words32 * 4
        tk = timeit(kernels.mul_chunks_pallas, a, b)
        tc = timeit(jit_core_mul, a, b)
        print(f"mul {t1}x{t2}: pallas {tk*1e3:.3f} ms ({out_bytes/tk/1e9:.1f} GB/s out) | "
              f"xla {tc*1e3:.3f} ms ({out_bytes/tc/1e9:.1f} GB/s out)")

        prod = got_c
        jit_core_dec = jax.jit(core.decrypt_parity, static_argnames="d")
        dk = kernels.decrypt_parity_pallas(prod, mask, ctx.d)
        dc = jit_core_dec(prod, mask, d=ctx.d)
        assert int(dk) == int(dc), "decrypt mismatch!"
        in_bytes = prod.shape[0] * ctx.words32 * 4
        tdk = timeit(kernels.decrypt_parity_pallas, prod, mask, ctx.d)
        tdc = timeit(lambda w, m: jit_core_dec(w, m, d=ctx.d), prod, mask)
        print(f"dec {prod.shape[0]} chunks: pallas {tdk*1e3:.3f} ms ({in_bytes/tdk/1e9:.1f} GB/s in) | "
              f"xla {tdc*1e3:.3f} ms ({in_bytes/tdc/1e9:.1f} GB/s in)")


if __name__ == "__main__":
    main()
