"""Full kernel-vs-oracle validation sweep on the real TPU.

CPU tests run the Pallas kernels in interpreter mode; this script re-proves
bit-exactness under the actual Mosaic compiler on hardware, across the shapes
that exercise padding/fallback paths, plus an end-to-end million-chunk run
(BASELINE config 5, single chip).

Run (directly or via the .tpuq worker): python tools/tpu_validate.py
Exit code 0 iff everything matches.
"""

from __future__ import annotations

import sys
import time


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from csgn_tpu.ciphertext import Ciphertext
    from csgn_tpu.context import Context
    from csgn_tpu.ops import core, dispatch, kernels
    from csgn_tpu.ops.permute_benes import build_plan
    from csgn_tpu.secret_key import SecretKey

    print(f"backend={jax.default_backend()} devices={jax.devices()}", file=sys.stderr)
    fails: list = []
    ctx = Context(1247, 16)
    rng = np.random.default_rng(0)
    vm = ctx.valid_mask[:, None]

    def rand_wc(chunks):
        return jnp.asarray(rng.integers(0, 2**32, (ctx.words32, chunks), dtype=np.uint32) & vm)

    # multiply kernel vs oracle (incl. pad path t1 % BI != 0)
    for t1, t2 in [(1, 128), (4, 128), (37, 256), (128, 1024), (4096, 512), (3, 4096)]:
        a, b = rand_wc(t1), rand_wc(t2)
        if not kernels.mul_pallas_supported(t1, t2, ctx.words32):
            print(f"mul {t1}x{t2}: pallas unsupported (expected)")
            continue
        ok = np.array_equal(
            np.asarray(kernels.mul_chunks_pallas(a, b)),
            np.asarray(jax.jit(core.mul_chunks)(a, b)),
        )
        print(f"mul {t1}x{t2}: exact={ok}")
        if not ok:
            fails.append(("mul", t1, t2))

    # decrypt kernel vs oracle
    sk = SecretKey.generate(ctx, jax.random.key(1))
    mask = jnp.asarray(sk.mask)
    for chunks in [1, 127, 4096, 100000]:
        w = rand_wc(chunks)
        ok = int(kernels.decrypt_parity_pallas(w, mask)) == int(jax.jit(core.decrypt_parity)(w, mask))
        print(f"dec pallas chunks={chunks}: exact={ok}")
        if not ok:
            fails.append(("dec", chunks))

    # permutation dispatch (XLA Beneš below threshold, Pallas-fused above)
    perm = rng.permutation(ctx.n).astype(np.int32)
    plan = build_plan(perm, ctx.n)
    permj = jnp.asarray(perm)
    for chunks in [1, 100, 8192, 131072]:
        w = rand_wc(chunks)
        ok = np.array_equal(
            np.asarray(dispatch.permute(w, plan)),
            np.asarray(jax.jit(core.permute_chunks, static_argnames="n")(w, permj, n=ctx.n)),
        )
        print(f"permute chunks={chunks}: exact={ok}")
        if not ok:
            fails.append(("permute", chunks))

    # fused multiply+decrypt (flat + tiled) vs the staged oracle, with
    # forced mask matches so nonzero parities are exercised
    for t1, t2, kind in [(5, 4096, "flat"), (64, 131072, "tiled"), (3, 384, "flat")]:
        a_np = np.asarray(rand_wc(t1)).copy()
        b_np = np.asarray(rand_wc(t2)).copy()
        a_np[:, rng.choice(t1, min(3, t1), replace=False)] |= sk.mask[:, None]
        b_np[:, rng.choice(t2, 5, replace=False)] |= sk.mask[:, None]
        a, b = jnp.asarray(a_np), jnp.asarray(b_np)
        prod, par = dispatch.mul_decrypt(a, b, mask)
        want_prod = jax.jit(core.mul_chunks)(a, b)
        ok = np.array_equal(np.asarray(prod), np.asarray(want_prod)) and int(par) == int(
            jax.jit(core.decrypt_parity)(want_prod, mask)
        )
        print(f"mul_decrypt {kind} {t1}x{t2}: exact={ok} parity={int(par)}")
        if not ok:
            fails.append(("mul_decrypt", t1, t2))

    # unaligned multiply band through the auto dispatch (ragged/grouped/
    # j-major paths) — canonicalized product vs oracle
    for t1, t2 in [(37, 1000), (100000, 3), (7, 70000), (513, 129)]:
        a, b = rand_wc(t1), rand_wc(t2)
        got = (Ciphertext(a, ctx) * Ciphertext(b, ctx)).canonical().wt
        ok = np.array_equal(np.asarray(got), np.asarray(jax.jit(core.mul_chunks)(a, b)))
        print(f"mul auto {t1}x{t2}: exact={ok}")
        if not ok:
            fails.append(("mul_auto", t1, t2))

    # FUSED multiply+decrypt over the full auto envelope (round 4): every
    # shape class of mul_chunks_auto routed through SecretKey.mul_and_decrypt;
    # canonicalized product + parity vs the staged oracle.  Expected routes
    # (printed from the dispatch counters): jm_flat, jm_tiled, ragged,
    # jm_ragged, jm_xla staged, grouped staged, xla staged.
    from csgn_tpu.utils.metrics import op_metrics

    for t1, t2 in [(4096, 5), (131072, 3), (7, 70000), (100000, 3),
                   (1000, 20), (513, 129), (37, 63)]:
        a_np = np.asarray(rand_wc(t1)).copy()
        b_np = np.asarray(rand_wc(t2)).copy()
        a_np[:, rng.choice(t1, min(3, t1), replace=False)] |= sk.mask[:, None]
        b_np[:, rng.choice(t2, min(5, t2), replace=False)] |= sk.mask[:, None]
        ca, cb = Ciphertext(jnp.asarray(a_np), ctx), Ciphertext(jnp.asarray(b_np), ctx)
        before = {k: v["calls"] for k, v in op_metrics().snapshot().items()
                  if k.startswith("dispatch.mul_dec")}
        prod, par = sk.mul_and_decrypt(ca, cb)
        after = {k: v["calls"] for k, v in op_metrics().snapshot().items()
                 if k.startswith("dispatch.mul_dec")}
        route = ",".join(k.split(".", 1)[1] for k in after
                         if after[k] > before.get(k, 0)) or "cached"
        want_prod = jax.jit(core.mul_chunks)(ca.wt, cb.wt)
        ok = np.array_equal(prod.chunk_major().T, np.asarray(want_prod)) and int(
            par
        ) == int(jax.jit(core.decrypt_parity)(want_prod, mask))
        print(f"mul_and_decrypt auto {t1}x{t2} [{route}]: exact={ok} parity={int(par)}")
        if not ok:
            fails.append(("mul_and_decrypt_auto", t1, t2))

    # chained fused: a pad/tag-carrying accumulator (real chain shape) into
    # the fused pipeline — the exact class round 3 silently staged.
    # (20000, 3) routes jm_ragged so the accumulator carries pads + a j-major
    # tag; the follow-up fused multiply must stay exact through them.
    accs = Ciphertext(rand_wc(20000), ctx) * Ciphertext(rand_wc(3), ctx)
    tiny_np = np.asarray(rand_wc(2)).copy()
    tiny_np[:, :1] |= sk.mask[:, None]
    tiny = Ciphertext(jnp.asarray(tiny_np), ctx)
    prod, par = sk.mul_and_decrypt(accs, tiny)
    want_prod = jax.jit(core.mul_chunks)(
        jnp.asarray(accs.canonical().wt), tiny.wt
    )
    ok = (
        accs.pad > 0
        and np.array_equal(prod.chunk_major().T, np.asarray(want_prod))
        and int(par) == int(jax.jit(core.decrypt_parity)(want_prod, mask))
    )
    print(f"mul_and_decrypt chained(tagged/padded, pad={accs.pad}) 60000x2: exact={ok}")
    if not ok:
        fails.append("mul_and_decrypt_chained")

    # batched k-permutation fused kernel vs per-element oracle
    from csgn_tpu.ops.permute_benes import apply_benes_batch_pallas, stack_plans

    kperms = [rng.permutation(ctx.n).astype(np.int32) for _ in range(4)]
    stacked = stack_plans([build_plan(p, ctx.n) for p in kperms])
    kwords = jnp.stack([rand_wc(4096) for _ in range(4)])
    got = np.asarray(apply_benes_batch_pallas(kwords, stacked))
    ok = all(
        np.array_equal(
            got[i],
            np.asarray(jax.jit(core.permute_chunks, static_argnames="n")(
                kwords[i], jnp.asarray(kperms[i]), n=ctx.n)),
        )
        for i in range(4)
    )
    print(f"batched multi-perm pallas k=4: exact={ok}")
    if not ok:
        fails.append("benes_batch")

    # pallas encrypt invariants + roundtrip
    from csgn_tpu.ops.encrypt_pallas import encrypt_bits_pallas

    bits = jnp.asarray(rng.integers(0, 2, 4096), dtype=jnp.uint8)
    words = np.asarray(
        encrypt_bits_pallas(1234, bits, sk.indices, sk.mask, ctx.valid_mask, ctx.n, ctx.d)
    )
    ok = (
        np.array_equal(np.asarray(sk.decrypt_batch(jnp.asarray(words))), np.asarray(bits))
        and bool(np.all(words & ~vm == 0))
    )
    print(f"pallas encrypt roundtrip+canonical: {ok}")
    if not ok:
        fails.append("encrypt")

    # end-to-end 2^20-chunk config (BASELINE config 5, single chip)
    t0 = time.time()
    big_bits = jnp.asarray(rng.integers(0, 2, 1 << 20), dtype=jnp.uint8)
    big = Ciphertext(sk.encrypt_batch(big_bits, jax.random.key(2)), ctx)
    op = Ciphertext(sk.encrypt_batch(jnp.asarray([1, 0], dtype=jnp.uint8), jax.random.key(3)), ctx)
    prod = big * op
    expect = int(np.asarray(big_bits).sum() % 2)
    ok = int(sk.decrypt(big)) == expect and int(sk.decrypt(prod)) == (expect & int(sk.decrypt(op)))
    print(f"e2e 1M-chunk multiply+decrypt: {ok} ({time.time()-t0:.1f}s)")
    if not ok:
        fails.append("e2e")

    print("FAILS:", fails or "none")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
