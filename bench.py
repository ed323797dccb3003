"""Headline benchmark: homomorphic multiply + decrypt throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (BASELINE.md / BASELINE.json configs): Context(1247, 16),
cross-product multiply (materialized output) and full-ciphertext decrypt.
The headline path is the FUSED Pallas kernel (ops/kernels.py
`mul_decrypt_pallas`): the decrypt parity accumulates in SMEM during the
same pass that writes the product, so the pipeline pays one product write
instead of write + read.  Staged mul and dec are also measured and reported
to stderr as regression guards.

The reference C++ baseline, measured in this environment (BASELINE.md):
  * multiply: 128x128 chunks -> 16384 out-chunks in 5.5 ms   (0.3357 us/chunk)
  * decrypt:  16384 chunks in 23.3 ms                        (1.4221 us/chunk)

Measurement discipline (docs/performance.md): the remote-TPU tunnel has
~27 ms dispatch RTT with ±2 ms jitter and on-chip rates drift run to run, so
every metric is measured in interleaved groups (fused/mul/dec/... cycled
INSIDE each group, RTT re-measured per group), K ops amplified per dispatch,
and the best group median is reported.  The printed spread is how tightly
the best THREE group medians agree ((3rd_best - best)/best) — the confidence
interval of the reported number, not the full drift band (hour-scale drift
makes max-min unbounded and non-convergent).  Groups EXTEND ADAPTIVELY
(up to MAX_GROUPS / a wall-clock cap) until the watched metric's spread
drops below 10%, so the driver artifact is decision-grade without re-runs;
if it still can't converge a loud banner prints (the JSON line is emitted
either way — the driver needs a result).

All diagnostics go to stderr; stdout carries exactly the one JSON line
(sub-metric rates + spreads ride along as extra keys in the same object).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REF_MUL_US_PER_CHUNK = 5.5e3 / 16384    # BASELINE.md: 128x128-chunk multiply
REF_DEC_US_PER_CHUNK = 23.3e3 / 16384   # BASELINE.md: 16384-chunk decrypt

GROUPS = 4        # initial interleaved measurement groups
MAX_GROUPS = 10   # adaptive-extension bound
MAX_EXTEND_S = 240  # wall-clock bound on adaptive extension
REPS = 5          # timed repetitions per metric per group
# Ops amplified per dispatch (fold-proof; see below).  r5: 16, not 8 — at
# ~4 ms/op the K=8 interval (~32 ms) was barely above the ~27 ms tunnel RTT,
# so RTT jitter leaked ~1 ms/op into single groups (a group measured 916
# GB/s "fused", above the same-job write anchor); K=16 halves the leverage.
K = 16
TARGET_SPREAD = 0.10


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def median_time(fetch, reps):
    """Median wall time of fetch() (a host-synchronizing scalar fetch)."""
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def _stats(ts, stat="best"):
    """(value, spread).

    stat="best": value = smallest group median; spread = agreement of the
    best three group medians — right for LONG intervals (>=30 ms) where the
    per-group RTT correction error is relatively small.
    stat="median": value = median group; spread = half-width of the middle
    three groups around the median — robust to RTT-mismatch outliers in
    BOTH directions, required for short intervals where best-of-groups
    systematically picks the group whose RTT estimate overshot (r4 lesson:
    an 8x-amplified 0.9 ms encrypt 'measured' 3134 GB/s that way)."""
    s = sorted(ts)
    if stat == "median":
        m = len(s) // 2
        med = s[m]
        lo, hi = s[max(0, m - 1)], s[min(len(s) - 1, m + 1)]
        return med, (hi - lo) / med if med > 0 else 0.0
    top = s[min(2, len(s) - 1)]
    return s[0], (top - s[0]) / s[0]


def interleaved_measure(
    fetches: dict, groups=GROUPS, reps=REPS, rtt_fetch=None,
    watch=None, max_groups=MAX_GROUPS, stat="best",
):
    """Measure every metric in every group, cycling metrics INSIDE the group
    (A/B/C/A/B/C...), re-measuring the RTT baseline per group.  With
    ``watch``, groups keep extending (bounded by ``max_groups`` and
    MAX_EXTEND_S) until that metric's spread falls under TARGET_SPREAD.
    Returns {name: (seconds, spread, [group seconds])} with ``seconds``
    picked per ``stat`` (see _stats)."""
    for f in fetches.values():
        f()  # warm / compile
    per_group = {k: [] for k in fetches}

    def add_group():
        rtt = median_time(rtt_fetch, 5) if rtt_fetch else 0.0
        for name, f in fetches.items():
            per_group[name].append(max(median_time(f, reps) - rtt, 1e-9))

    t0 = time.perf_counter()
    for _ in range(groups):
        add_group()
    if watch is not None:
        while (
            _stats(per_group[watch], stat)[1] > TARGET_SPREAD
            and len(per_group[watch]) < max_groups
            and time.perf_counter() - t0 < MAX_EXTEND_S
        ):
            log(f"[extend] {watch} spread "
                f"{_stats(per_group[watch], stat)[1]*100:.1f}% > "
                f"{TARGET_SPREAD*100:.0f}%: adding group "
                f"{len(per_group[watch]) + 1}")
            add_group()
    return {name: (*_stats(ts, stat), ts) for name, ts in per_group.items()}


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
    rtt_fetch = lambda: np.asarray(triv(z))  # noqa: E731
    rtt0 = median_time(rtt_fetch, 7)
    log(f"rtt={rtt0*1e3:.2f} ms (re-measured per group below)")

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

    # Amplification: K ops per dispatch so tunnel RTT jitter (± ~2 ms) is
    # small relative to the measured interval.  Pallas custom calls are
    # opaque to XLA (no folding/elision while their outputs are consumed);
    # each of the K calls gets a distinct input (a ^ k).  The decrypt scan
    # chains each pass's mask on the previous parity so the K passes cannot
    # be batched into one.

    # --- staged multiply (Pallas cross-product kernel) + exactness guards.
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

    # --- fused multiply+decrypt guards (same shape class as the staged mul).
    fused_fn = (
        (lambda a, b, m: kernels.mul_decrypt_pallas(a, b, m))
        if use_pallas
        else (lambda a, b, m: (core.mul_chunks(a, b), core.decrypt_parity(core.mul_chunks(a, b), m)))
    )
    fh, fp = jax.jit(lambda a, b: fused_fn(a, b, mask))(a[:, :4], b)
    assert np.array_equal(np.asarray(fh)[:, :t2], np.asarray(core.mul_chunks(a[:, :4], b))[:, :t2])
    assert int(fp) == int(core.decrypt_parity(core.mul_chunks(a[:, :4], b), mask)), (
        "fused parity mismatch vs staged oracle"
    )
    del fh, fp

    @jax.jit
    def mulK(a, b):
        outs = []
        for k in range(K):
            o = mul_fn(a ^ jnp.uint32(k), b)
            outs.append(o[0, 0])
        return jnp.stack(outs)

    @jax.jit
    def fusedK(a, b):
        outs = []
        for k in range(K):
            o, p = fused_fn(a ^ jnp.uint32(k), b, mask)
            outs.append(o[0, 0] ^ p)
        return jnp.stack(outs)

    # --- write-SOL anchor at the SAME blocking, in the SAME groups (r5):
    # cross-round numbers become drift-normalizable via value_vs_anchor.
    @jax.jit
    def anchorK(a):
        s = a[0, 0]
        for k in range(K):
            o = kernels.fill_anchor_pallas(
                jnp.reshape(s ^ jnp.uint32(k), (1,)), t1, t2, w
            )
            s = o[0, 0]
        return s

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

    # --- interleaved measurement: fused / staged-mul / staged-dec per group,
    # extending adaptively until the headline (fused) spread converges.
    res = interleaved_measure(
        {
            "fused": lambda: np.asarray(fusedK(a, b)),
            "mul": lambda: np.asarray(mulK(a, b)),
            "dec": lambda: np.asarray(decK(big, mask)),
            "anchor": lambda: np.asarray(anchorK(a)),
        },
        rtt_fetch=rtt_fetch,
        watch="fused",
    )
    t_fused = res["fused"][0] / K
    t_mul = res["mul"][0] / K
    t_dec = res["dec"][0] / K
    t_anchor = res["anchor"][0] / K

    out_chunks = t1 * t2
    anchor_gbps = out_chunks * w * 4 / t_anchor / 1e9
    mul_gbps = out_chunks * w * 4 / t_mul / 1e9
    mul_us_per_chunk = t_mul * 1e6 / out_chunks
    fused_gbps = out_chunks * w * 4 / t_fused / 1e9
    fused_us_per_chunk = t_fused * 1e6 / out_chunks
    dec_gbps = dec_chunks * w * 4 / t_dec / 1e9
    dec_us_per_chunk = t_dec * 1e6 / dec_chunks

    for name, (best, spread, ts) in res.items():
        log(f"{name}: best {best/K*1e3:.2f} ms  spread {spread*100:.1f}%  "
            f"groups [{', '.join(f'{t/K*1e3:.2f}' for t in ts)}] ms")
    log(f"fused mul+dec {t1}x{t2}: {t_fused*1e3:.2f} ms  {fused_gbps:.0f} GB/s out  "
        f"{fused_us_per_chunk*1e3:.4f} ns/chunk  pallas={use_pallas}")
    log(f"mul {t1}x{t2}: {t_mul*1e3:.2f} ms  {mul_gbps:.0f} GB/s out  "
        f"{mul_us_per_chunk*1e3:.4f} ns/chunk")
    log(f"dec {dec_chunks}: {t_dec*1e3:.2f} ms  {dec_gbps:.0f} GB/s in  "
        f"{dec_us_per_chunk*1e3:.4f} ns/chunk")
    # value_vs_anchor: median over groups of the SAME-GROUP time ratio —
    # the group's RTT-correction error inflates/deflates both ops together,
    # so the ratio survives the jitter that pollutes single-group rates.
    ratios = sorted(
        ta / tf for ta, tf in zip(res["anchor"][2], res["fused"][2])
    )
    value_vs_anchor = ratios[len(ratios) // 2]
    log(f"anchor (write-SOL fill, same blocking/groups): {t_anchor*1e3:.2f} ms  "
        f"{anchor_gbps:.0f} GB/s  value_vs_anchor (median per-group) = "
        f"{value_vs_anchor:.3f}")

    headline_spread = res["fused"][1]
    if headline_spread > TARGET_SPREAD:
        log("=" * 72)
        log(f"WARNING: headline best-3 spread {headline_spread*100:.1f}% > "
            f"{TARGET_SPREAD*100:.0f}% even after adaptive extension to "
            f"{len(res['fused'][2])} groups — tunnel/thermal variance is "
            f"polluting this run; treat the JSON value as a lower bound.")
        log("=" * 72)

    del a, b, big

    # --- encrypt (stderr diagnostic row; regression guard for BENCH history).
    # On TPU: the Pallas hardware-PRNG engine at its tuned block size.  On
    # CPU: the threefry oracle at a small batch (no Pallas PRNG lowering).
    from csgn_tpu.secret_key import SecretKey

    sk = SecretKey.generate(ctx, jax.random.key(0))
    enc_batch = 1 << 22 if on_tpu else 1 << 12
    bits = jnp.asarray(rng.integers(0, 2, enc_batch, dtype=np.uint8))
    # The aux ops are ~1-2 ms each, so the headline K leaves the amplified
    # interval (~8-16 ms) small against the tunnel's RTT swings; the per-group
    # RTT correction error then dominates and best-of-groups cherry-picks it
    # (r4: an 8x encrypt "measured" 3134 GB/s — 4x HBM).  Higher K brings the
    # interval to ~30 ms, and the aux rows use the MEDIAN group (robust).
    ENC_K = 32 if on_tpu else 1
    PERM_K = 16 if on_tpu else K
    if on_tpu:
        from csgn_tpu.ops.encrypt_pallas import encrypt_bits_pallas

        @jax.jit
        def encK(bits):
            outs = []
            for k in range(ENC_K):
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

    enc_k = ENC_K

    # --- permutation (stderr diagnostic row): fused Beneš on packed chunks.
    from csgn_tpu.ops import permute_benes

    perm = rng.permutation(ctx.n)
    plan = permute_benes.build_plan(perm, ctx.n)
    pc = 1 << 20 if on_tpu else 1 << 12
    px = jnp.asarray(rng.integers(0, 2**32, (w, pc), dtype=np.uint32) & ctx.valid_mask[:, None])
    if on_tpu:
        def papply(x, bc):
            return permute_benes.apply_benes_pallas(x, plan, block_c=bc)
    else:
        def papply(x, bc):
            return permute_benes.apply_benes(x, plan)

    small_in = px[:, :256]
    assert np.array_equal(
        np.asarray(jax.jit(lambda x: papply(x, 2048))(small_in)),
        np.asarray(core.permute_chunks(small_in, jnp.asarray(perm), ctx.n)),
    ), "permute kernel mismatch vs oracle"

    # Unrolled chain: a lax.scan carry forces an extra whole-array copy per
    # iteration on this backend (measured ~20% overhead), and real permutation
    # chains are unrolled jit calls anyway.  block_c is auto-tuned AT BENCH
    # TIME: the candidates run interleaved in the same groups, so the pick is
    # drift-proof (round-4 VERDICT item 4).
    def make_permK(bc):
        @jax.jit
        def permK(x):
            y = x
            for _ in range(PERM_K):
                y = papply(y, bc)
            return y[0, 0]

        return permK

    # r5 no-pad kernel sweeps (.tpuq/perm_study_r5.out, perm_sweep2_r5.out,
    # perm_ratio_r5.out): 1024 is the steady winner, 2048 close behind;
    # 512/768/1536/4096/8192 clearly lose.  Auto-tune between the top two.
    perm_bcs = (1024, 2048) if on_tpu else (1024,)
    perm_fns = {f"perm{bc}": make_permK(bc) for bc in perm_bcs}
    aux = interleaved_measure(
        {"enc": lambda: np.asarray(encK(bits)),
         **{name: (lambda f=f: np.asarray(f(px))) for name, f in perm_fns.items()}},
        groups=3, reps=3, rtt_fetch=rtt_fetch, watch="enc", max_groups=6,
        stat="median",
    )
    t_enc = aux["enc"][0] / enc_k
    best_perm = min((aux[f"perm{bc}"][0], bc) for bc in perm_bcs)
    t_perm, perm_bc = best_perm[0] / PERM_K, best_perm[1]
    enc_rate = enc_batch / t_enc / 1e9
    # Impossible-rate guard: the measured HW-PRNG roofline is 729 GB/s write
    # (docs/performance.md "Encrypt roofline").  Anything past roofline+10%
    # is a measurement artifact (RTT correction error), never a real rate.
    # Derived from the context's word count so the threshold follows W.
    ENC_PRNG_ROOFLINE_GBPS = 729.0
    enc_suspect = on_tpu and enc_rate > 1.1 * ENC_PRNG_ROOFLINE_GBPS / (w * 4)
    if enc_suspect:
        log(f"WARNING: enc rate {enc_rate:.2f} B/s exceeds the PRNG roofline "
            "— RTT-correction artifact; reporting the row as suspect")
    log(f"enc {enc_batch}: {t_enc*1e3:.2f} ms  {enc_rate:.2f} B enc/s  "
        f"{enc_batch*w*4/t_enc/1e9:.0f} GB/s write  spread {aux['enc'][1]*100:.1f}%")
    for bc in perm_bcs:
        log(f"perm {pc} block_c={bc}: {aux[f'perm{bc}'][0]/PERM_K*1e3:.2f} ms  "
            f"{pc*w*4/(aux[f'perm{bc}'][0]/PERM_K)/1e9:.0f} GB/s packed  "
            f"spread {aux[f'perm{bc}'][1]*100:.1f}%")
    log(f"perm winner: block_c={perm_bc}  {pc*w*4/t_perm/1e9:.0f} GB/s packed")

    # --- serving latency (r5): dispatch-amortization speedup as a tracked
    # sub-metric.  S small independent fused mul+decrypt requests served one
    # call at a time vs ONE BatchExecutor flush (same requests); the ratio is
    # the microbatching win (docs/performance.md "Serving latency" — the
    # reference's per-op dispatch model, tests/timings.cpp:26-42, amortized).
    # Median group stat: these are multi-dispatch latencies, so no RTT
    # subtraction — the RTT IS the quantity being amortized.
    from csgn_tpu.ciphertext import Ciphertext
    from csgn_tpu.serve import BatchExecutor

    s_req = 16 if on_tpu else 6
    sc = 2  # 2x2-chunk products: dispatch-bound, the serving-fleet regime
    pw = rng.integers(0, 2**32, (2 * s_req, w, sc), dtype=np.uint32) \
        & np.asarray(ctx.valid_mask)[None, :, None]
    pairs = [
        (Ciphertext(jnp.asarray(pw[2 * i]), ctx), Ciphertext(jnp.asarray(pw[2 * i + 1]), ctx))
        for i in range(s_req)
    ]

    def serve_loop():
        return np.asarray([int(sk.mul_and_decrypt(c1, c2)[1]) for c1, c2 in pairs])

    def serve_batch():
        ex = BatchExecutor(sk)
        futs = [ex.submit_mul_decrypt(c1, c2) for c1, c2 in pairs]
        ex.flush()
        return np.asarray([int(f.result()[1]) for f in futs])

    assert np.array_equal(serve_loop(), serve_batch()), "serve paths disagree"
    sres = interleaved_measure(
        {"serve_loop": serve_loop, "serve_batch": serve_batch},
        groups=3, reps=3, stat="median",
    )
    t_loop, t_batch = sres["serve_loop"][0], sres["serve_batch"][0]
    serve_speedup = t_loop / t_batch
    serve_spread = max(sres["serve_loop"][1], sres["serve_batch"][1])
    log(f"serve: loop {t_loop*1e3:.1f} ms vs flush {t_batch*1e3:.1f} ms for "
        f"{s_req} requests -> {serve_speedup:.1f}x  spread {serve_spread*100:.1f}%")

    # --- flagship capability row (r5 continuation): homomorphic AES-128
    # fleet throughput through the fleet expr path (one encrypt_batch, one
    # 229k-node DAG, packed-int fold — docs/performance.md "Deep circuits").
    # Informational composite (host+dispatch), not a kernel rate: best of 2
    # end-to-end runs, guarded so a failure never breaks the JSON line.
    aes_fleet_bps = None
    try:
        from csgn_tpu.batch import CiphertextBatch
        from csgn_tpu.models.aes import aes128
        from csgn_tpu.models.netlist import bits_from_bytes, bytes_from_bits, eval_expr

        fb = 64
        fleet_nl = aes128()
        fkeys = [bytes([(7 * b + i) % 256 for i in range(16)]) for b in range(fb)]
        fkeys[0] = bytes(range(16))  # FIPS C.1 anchor
        fblock = bytes.fromhex("00112233445566778899aabbccddeeff")
        bit_mat = np.zeros((256, fb), dtype=np.uint8)
        for b in range(fb):
            bit_mat[:, b] = bits_from_bytes(fkeys[b] + fblock)
        one_ct = sk.encrypt(1, jax.random.key(0xF1))
        times = []
        for rep in range(2):
            t0 = time.perf_counter()
            fw = sk.encrypt_batch(
                jnp.asarray(bit_mat.reshape(-1)), jax.random.key(0xF2 + rep)
            )
            w3 = jnp.transpose(jnp.reshape(fw, (fw.shape[0], 256, fb)), (2, 0, 1))
            wires = [CiphertextBatch(w3[:, :, i : i + 1], ctx) for i in range(256)]
            (fouts,) = eval_expr(fleet_nl, [wires[:128], wires[128:]], one_ct)
            fres = sk.decrypt_circuits(fouts)
            times.append(time.perf_counter() - t0)
            got0 = bytes_from_bits([int(r[0]) for r in fres])
            assert got0.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a", got0.hex()
        aes_fleet_bps = fb / min(times)
        log(f"aes fleet: B={fb} in {min(times):.2f} s -> {aes_fleet_bps:.1f} "
            f"homomorphic AES-128 blocks/s (FIPS-anchored)")
    except AssertionError as exc:
        # WRONG ciphertext — a correctness regression, not an infra hiccup.
        # -1.0 (never a real rate) so the driver artifact shows the
        # difference from a skipped row (null).
        aes_fleet_bps = -1.0
        log(f"aes fleet CORRECTNESS FAILURE (wrong block): {exc}")
    except Exception as exc:  # noqa: BLE001 — informational row only
        log(f"aes fleet row skipped: {type(exc).__name__}: {exc}")

    # --- headline: fused mul+dec throughput per chunk vs reference C++.
    # The workload is the reference's multiply-then-decrypt pipeline; ours
    # fuses the two (one pass).  Staged rates are the stderr rows above.
    ours_us_per_chunk = fused_us_per_chunk
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
                # sub-metrics so rounds compare without stderr archaeology
                # (spreads are best-3 group agreement, percent)
                "fused_gbps": round(fused_gbps, 1),
                "fused_spread_pct": round(res["fused"][1] * 100, 1),
                "groups": len(res["fused"][2]),
                # same-groups write-SOL anchor: cross-round drift normalizer
                # (value_vs_anchor ~constant across hours; raw value drifts)
                "anchor_gbps": round(anchor_gbps, 1),
                "anchor_spread_pct": round(res["anchor"][1] * 100, 1),
                "value_vs_anchor": round(value_vs_anchor, 3),
                "mul_gbps": round(mul_gbps, 1),
                "mul_spread_pct": round(res["mul"][1] * 100, 1),
                "dec_gbps": round(dec_gbps, 1),
                "dec_spread_pct": round(res["dec"][1] * 100, 1),
                "enc_b_per_s": round(enc_batch / t_enc / 1e9, 2),
                "enc_spread_pct": round(aux["enc"][1] * 100, 1),
                "enc_suspect": enc_suspect,
                # same-JOB (not same-group) anchor ratios for the aux rows:
                # coarser than value_vs_anchor but still separates a slow
                # hour from a kernel regression across rounds.
                "enc_vs_anchor": round(enc_batch * w * 4 / t_enc / 1e9 / anchor_gbps, 3),
                "perm_gbps": round(pc * w * 4 / t_perm / 1e9, 1),
                "perm_block_c": perm_bc,
                "perm_spread_pct": round(aux[f"perm{perm_bc}"][1] * 100, 1),
                "perm_vs_anchor": round(pc * w * 4 / t_perm / 1e9 / anchor_gbps, 3),
                "serve_speedup": round(serve_speedup, 1),
                "serve_loop_ms": round(t_loop * 1e3, 1),
                "serve_batch_ms": round(t_batch * 1e3, 1),
                "serve_spread_pct": round(serve_spread * 100, 1),
                # flagship capability: encrypted AES-128 blocks/s (fleet
                # expr path, B=64, FIPS-anchored; None = row skipped on an
                # infra error, -1.0 = WRONG OUTPUT (correctness regression))
                "aes_fleet_blocks_per_s": (
                    round(aes_fleet_bps, 1) if aes_fleet_bps is not None else None
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
