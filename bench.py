"""Headline benchmark: homomorphic multiply + decrypt throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (BASELINE.md / BASELINE.json configs): Context(1247, 16),
cross-product multiply (materialized output) and full-ciphertext decrypt.
The reference C++ baseline, measured in this environment (BASELINE.md):
  * multiply: 128x128 chunks -> 16384 out-chunks in 5.5 ms   (0.3357 us/chunk)
  * decrypt:  16384 chunks in 23.3 ms                        (1.4221 us/chunk)
Ours is measured at saturation size (the remote-TPU tunnel has ~27 ms RTT, so
per-op timing subtracts a measured RTT baseline and uses GB-scale workloads;
methodology details in docs/performance.md).

All diagnostics go to stderr; stdout carries exactly the one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REF_MUL_US_PER_CHUNK = 5.5e3 / 16384    # BASELINE.md: 128x128-chunk multiply
REF_DEC_US_PER_CHUNK = 23.3e3 / 16384   # BASELINE.md: 16384-chunk decrypt


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def median_scalar_time(fetch, reps=7):
    """Median wall time of fetch() (a host-synchronizing scalar fetch)."""
    fetch()  # warm (compile)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[reps // 2]


def main():
    import jax
    import jax.numpy as jnp

    from csgn_tpu.context import Context
    from csgn_tpu.ops import core, kernels

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    log(f"backend={backend} devices={jax.devices()}")

    ctx = Context(1247, 16)
    w = ctx.words32
    rng = np.random.default_rng(0)

    # RTT baseline: cost of a dispatch + 4-byte fetch with trivial compute.
    z = jnp.zeros((8,), jnp.uint32)
    triv = jax.jit(lambda z: z.sum())
    rtt = median_scalar_time(lambda: np.asarray(triv(z)))
    log(f"rtt={rtt*1e3:.2f} ms")

    # Sizes: saturation scale on TPU, small on CPU fallback.
    if on_tpu:
        t1 = t2 = 4096          # 16.7M out-chunks, 2.68 GB output
        dec_chunks = 1 << 24    # 2.68 GB input
    else:
        t1 = t2 = 256
        dec_chunks = 1 << 16

    a = jnp.asarray(rng.integers(0, 2**32, (w, t1), dtype=np.uint32) & ctx.valid_mask[:, None])
    b = jnp.asarray(rng.integers(0, 2**32, (w, t2), dtype=np.uint32) & ctx.valid_mask[:, None])
    mask_np = np.zeros(w, np.uint32)
    for pos in (np.arange(ctx.d) * 71 + 5) % ctx.n:
        mask_np[pos // 32] |= np.uint32(1) << (31 - pos % 32)
    mask = jnp.asarray(mask_np)

    # Amplification factor: K ops per dispatch so tunnel RTT jitter (± ~2 ms)
    # is small relative to the measured interval.  Pallas custom calls are
    # opaque to XLA (no folding/elision while their outputs are consumed), and
    # the decrypt scan chains each pass's mask on the previous parity so the
    # K passes cannot be batched into one.
    K = 8

    # --- multiply (Pallas cross-product kernel; output materialized in HBM).
    use_pallas = on_tpu and kernels.mul_pallas_supported(t1, t2, w)
    mul_fn = kernels.mul_chunks_pallas if use_pallas else core.mul_chunks

    got = np.asarray(mul_fn(a[:, :4], b[:, :128]))
    want = np.asarray(core.mul_chunks(a[:, :4], b[:, :128]))
    assert np.array_equal(got, want), "mul kernel mismatch vs oracle"
    del got, want

    # Full-size guard: first output tile at the measured shape (catches
    # grid-indexing regressions the small-slice check cannot).  Output order
    # is i-major, so out[:, :t2] must equal a-column-0 AND all of b.
    head = np.asarray(jax.jit(lambda a, b: mul_fn(a, b)[:, :t2])(a, b))
    want_head = np.asarray(core.mul_chunks(a[:, :1], b))
    assert np.array_equal(head, want_head), "mul kernel mismatch at measured shape"
    del head, want_head

    @jax.jit
    def mulK(a, b):
        outs = []
        for k in range(K):
            o = mul_fn(a ^ jnp.uint32(k), b)
            outs.append(o[0, 0])
        return jnp.stack(outs)

    t_mul = max((median_scalar_time(lambda: np.asarray(mulK(a, b))) - rtt) / K, 1e-9)
    out_chunks = t1 * t2
    mul_gbps = out_chunks * w * 4 / t_mul / 1e9
    mul_us_per_chunk = t_mul * 1e6 / out_chunks
    log(f"mul {t1}x{t2}: {t_mul*1e3:.2f} ms  {mul_gbps:.0f} GB/s out  {mul_us_per_chunk*1e3:.4f} ns/chunk  pallas={use_pallas}")
    del a, b

    # --- decrypt (XLA eq-all + parity; input streamed from HBM).
    big = jnp.asarray(rng.integers(0, 2**32, (w, dec_chunks), dtype=np.uint32))
    dec_jit = jax.jit(core.decrypt_parity)
    small = big[:, :1024]
    assert int(dec_jit(small, mask)) == int(core.decrypt_parity(small, mask))

    @jax.jit
    def decK(big, mask):
        def step(carry, _):
            p = core.decrypt_parity(big, mask ^ carry)
            return p, p
        _, ps = jax.lax.scan(step, jnp.uint32(0), None, length=K)
        return ps

    t_dec = max((median_scalar_time(lambda: np.asarray(decK(big, mask))) - rtt) / K, 1e-9)
    dec_gbps = dec_chunks * w * 4 / t_dec / 1e9
    dec_us_per_chunk = t_dec * 1e6 / dec_chunks
    log(f"dec {dec_chunks}: {t_dec*1e3:.2f} ms  {dec_gbps:.0f} GB/s in  {dec_us_per_chunk*1e3:.4f} ns/chunk")

    del big

    # --- encrypt (stderr diagnostic row; regression guard for BENCH history).
    # On TPU: the Pallas hardware-PRNG engine at its tuned block size.  On
    # CPU: the threefry oracle at a small batch (the Pallas PRNG has no CPU
    # lowering).
    from csgn_tpu.secret_key import SecretKey

    sk = SecretKey.generate(ctx, jax.random.key(0))
    enc_batch = 1 << 22 if on_tpu else 1 << 12
    bits = jnp.asarray(rng.integers(0, 2, enc_batch, dtype=np.uint8))
    if on_tpu:
        from csgn_tpu.ops.encrypt_pallas import encrypt_bits_pallas

        @jax.jit
        def encK(bits):
            outs = []
            for k in range(K):
                o = encrypt_bits_pallas(
                    1234 + k, bits, sk.indices, sk.mask, ctx.valid_mask, ctx.n, ctx.d
                )
                outs.append(o[0, 0])
            return jnp.stack(outs)
    else:

        @jax.jit
        def encK(bits):
            o = core.encrypt_bits(jax.random.key(5), bits, jnp.asarray(sk.indices),
                                  jnp.asarray(sk.mask), jnp.asarray(ctx.valid_mask),
                                  ctx.n, ctx.d)
            return o[0, 0][None]

        # amplification=1 on CPU; adjust divisor below via enc_k.
    enc_k = K if on_tpu else 1
    t_enc = max((median_scalar_time(lambda: np.asarray(encK(bits))) - rtt) / enc_k, 1e-9)
    log(f"enc {enc_batch}: {t_enc*1e3:.2f} ms  {enc_batch/t_enc/1e9:.2f} B enc/s  "
        f"{enc_batch*w*4/t_enc/1e9:.0f} GB/s write")

    # --- permutation (stderr diagnostic row): fused Beneš on packed chunks.
    from csgn_tpu.ops import permute_benes

    perm = rng.permutation(ctx.n)
    plan = permute_benes.build_plan(perm, ctx.n)
    pc = 1 << 20 if on_tpu else 1 << 12
    px = jnp.asarray(rng.integers(0, 2**32, (w, pc), dtype=np.uint32) & ctx.valid_mask[:, None])
    papply = (
        (lambda x: permute_benes.apply_benes_pallas(x, plan))
        if on_tpu
        else (lambda x: permute_benes.apply_benes(x, plan))
    )

    small_in = px[:, :256]
    assert np.array_equal(
        np.asarray(jax.jit(papply)(small_in)),
        np.asarray(core.permute_chunks(small_in, jnp.asarray(perm), ctx.n)),
    ), "permute kernel mismatch vs oracle"

    # Unrolled chain: a lax.scan carry forces an extra whole-array copy per
    # iteration on this backend (measured ~20% overhead), and real permutation
    # chains are unrolled jit calls anyway.
    @jax.jit
    def permK(x):
        y = x
        for _ in range(K):
            y = papply(y)
        return y[0, 0]

    t_perm = max((median_scalar_time(lambda: np.asarray(permK(px))) - rtt) / K, 1e-9)
    perm_gbps = pc * w * 4 / t_perm / 1e9
    log(f"perm {pc}: {t_perm*1e3:.2f} ms  {perm_gbps:.0f} GB/s packed")

    # --- headline: combined mul+dec throughput per chunk vs reference C++.
    ours_us_per_chunk = mul_us_per_chunk + dec_us_per_chunk
    ref_us_per_chunk = REF_MUL_US_PER_CHUNK + REF_DEC_US_PER_CHUNK
    speedup = ref_us_per_chunk / ours_us_per_chunk
    value = 1.0 / ours_us_per_chunk  # chunk mul+dec ops per microsecond -> Mops/s

    print(
        json.dumps(
            {
                "metric": "homomorphic mul+dec chunk throughput per chip, Context(1247,16)",
                "value": round(value, 3),
                "unit": "M chunk-ops/s",
                "vs_baseline": round(speedup, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
