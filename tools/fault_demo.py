"""Fault injection for elastic recovery (SURVEY.md §5: "drop a host between
steps").

Phase 1: a 2-process jax.distributed job runs a multiply chain over the
global 4-device mesh, checkpointing the accumulator after every completed
step.  While step FAULT_STEP is in flight, the driver SIGKILLs worker 1
(the exact child PID — a real host loss mid-collective); worker 0, stuck in
the now-unanswerable collective, is torn down by the driver, like a job
scheduler reaping a degraded job.

Phase 2: a fresh SINGLE-process job (a different world: 2 local devices
instead of 2x2) loads the last checkpoint, re-lays the chunk axis on its
smaller mesh, completes the remaining steps, and decrypts.

The final decrypt and product words must be bit-identical to an unsharded
single-process oracle of the full chain — the checkpoint really is the
recovery unit, and resume is mesh-shape-independent.

Run: python tools/fault_demo.py            (driver; spawns workers)
"""

from __future__ import annotations

import argparse
import os
import pathlib
import signal
import subprocess
import sys
import time

PORT = 19741
NPROC = 2
LOCAL_DEVICES = 2
N_STEPS = 3          # multiply steps in the chain
FAULT_STEP = 2       # worker 1 dies while this step is in flight


def _inputs():
    """Deterministic chain inputs, identical in every process/phase."""
    import jax.numpy as jnp
    import numpy as np

    from csgn_tpu.context import Context
    from csgn_tpu.secret_key import SecretKey

    ctx = Context(1247, 16)
    rng = np.random.default_rng(7)
    acc0 = jnp.asarray(
        rng.integers(0, 2**32, (ctx.words32, 8), dtype=np.uint32) & ctx.valid_mask[:, None]
    )
    ops = [
        jnp.asarray(
            rng.integers(0, 2**32, (ctx.words32, 2), dtype=np.uint32) & ctx.valid_mask[:, None]
        )
        for _ in range(N_STEPS)
    ]
    sk = SecretKey(ctx, np.arange(ctx.d, dtype=np.int32) * 71 + 3)
    return ctx, acc0, ops, sk


def worker(pid: int, workdir: str) -> int:
    import jax

    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=NPROC,
        process_id=pid,
    )
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from csgn_tpu import Ciphertext, io as cio
    from csgn_tpu.parallel import chunk_mesh, sharded_mul_broadcast

    wd = pathlib.Path(workdir)
    ctx, acc, ops, sk = _inputs()
    mesh = chunk_mesh(len(jax.devices()))

    for step, op in enumerate(ops):
        if step == FAULT_STEP:
            # Mark the step in flight so the driver can kill worker 1 while
            # worker 0 sits inside the step's gather collective.  Worker 1
            # lingers before joining it, giving the driver a deterministic
            # window: the SIGKILL lands while its peer is mid-collective.
            (wd / f"inflight_{pid}").write_text(str(os.getpid()))
            if pid == 1:
                time.sleep(20)
        acc = sharded_mul_broadcast(acc, op, mesh)  # chunks: 8 -> 16 -> 32 -> 64
        # Checkpoint the full accumulator (cross-process gather; every
        # process participates, rank 0 writes the file).
        full = multihost_utils.process_allgather(acc, tiled=True)
        if pid == 0:
            cio.save_state(
                wd / f"ckpt_step{step}.npz",
                {"acc": Ciphertext(jnp.asarray(full), ctx), "sk": sk},
            )
            (wd / f"done_step{step}").write_text("ok")
        multihost_utils.sync_global_devices(f"step{step}")
    return 0


def resume(workdir: str) -> int:
    """Phase 2: single process, 2 local devices, finish the chain."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from csgn_tpu import io as cio
    from csgn_tpu.ops import core
    from csgn_tpu.parallel import (
        chunk_mesh,
        shard_ciphertext,
        sharded_decrypt_parity,
        sharded_mul_broadcast,
    )

    wd = pathlib.Path(workdir)
    done = sorted(int(p.name.split("step")[1]) for p in wd.glob("done_step*"))
    assert done, "no completed checkpoint found"
    last = done[-1]
    assert last < N_STEPS - 1, "fault did not interrupt the chain"
    state = cio.load_state(wd / f"ckpt_step{last}.npz")
    ctx, acc0, ops, sk = _inputs()

    mesh = chunk_mesh(len(jax.devices()))  # 2 devices now, was 4
    acc = shard_ciphertext(state["acc"], mesh).wt
    for op in ops[last + 1 :]:
        acc = sharded_mul_broadcast(acc, op, mesh)
    parity = int(sharded_decrypt_parity(acc, jnp.asarray(state["sk"].mask), mesh))

    # Unsharded oracle of the FULL chain (no checkpoint, no fault).
    want = acc0
    for op in ops:
        want = core.mul_chunks(want, op)
    want_parity = int(core.decrypt_parity(want, jnp.asarray(sk.mask)))

    ok_words = np.array_equal(jax.device_get(acc), np.asarray(want))
    ok = ok_words and parity == want_parity
    print(
        f"resumed from step {last} on {len(jax.devices())} devices: "
        f"words_exact={ok_words} parity={parity} want={want_parity} "
        f"-> {'OK' if ok else 'FAIL'}",
        flush=True,
    )
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--workdir", type=str, default=None)
    args = ap.parse_args()
    if args.worker is not None:
        return worker(args.worker, args.workdir)
    if args.resume:
        return resume(args.workdir)

    import tempfile

    wd = tempfile.mkdtemp(prefix="fault_demo_")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={LOCAL_DEVICES}"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i),
             "--workdir", wd],
            env=env,
        )
        for i in range(NPROC)
    ]
    try:
        # Wait until both workers are inside the FAULT_STEP collective.
        deadline = time.time() + 300
        while time.time() < deadline:
            if all(
                (pathlib.Path(wd) / f"inflight_{i}").exists() for i in range(NPROC)
            ):
                break
            if any(p.poll() is not None for p in procs):
                print("fault demo: FAIL (worker exited early)")
                return 1
            time.sleep(0.2)
        else:
            print("fault demo: FAIL (never reached the fault step)")
            return 1

        time.sleep(0.5)  # let both sink into the collective
        procs[1].send_signal(signal.SIGKILL)  # the injected host loss
        procs[1].wait(timeout=30)
        print(f"killed worker 1 (pid {procs[1].pid}) mid-step {FAULT_STEP}", flush=True)

        # Worker 0 is wedged in a collective whose peer is gone; reap it like
        # a job scheduler tearing down the degraded job.
        time.sleep(1.0)
        if procs[0].poll() is None:
            procs[0].send_signal(signal.SIGKILL)
        procs[0].wait(timeout=30)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    # The pre-fault checkpoint must exist; the fault-step one must not.
    if not (pathlib.Path(wd) / f"done_step{FAULT_STEP - 1}").exists():
        print("fault demo: FAIL (no pre-fault checkpoint)")
        return 1
    if (pathlib.Path(wd) / f"done_step{FAULT_STEP}").exists():
        print("fault demo: FAIL (fault step completed anyway?)")
        return 1

    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--resume", "--workdir", wd],
        env=env,
        timeout=300,
    )
    print("fault demo:", "OK" if r.returncode == 0 else "FAIL")
    return r.returncode


if __name__ == "__main__":
    sys.exit(main())
