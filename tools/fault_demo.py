"""Fault injection for elastic recovery (SURVEY.md §5: "drop a host between
steps").

Phase 1: an N-process jax.distributed job (``--nproc``, default 2; each
process owns 2 local devices) runs a multiply chain over the global
2N-device mesh, checkpointing the accumulator after every completed step.
While step FAULT_STEP is in flight, the driver SIGKILLs the last worker
(the exact child PID — a real host loss mid-collective); the survivors,
stuck in the now-unanswerable collective, are torn down by the driver, like
a job scheduler reaping a degraded job.

Phase 2: a fresh SINGLE-process job (a different world: 2 local devices
instead of N x 2) loads the last checkpoint, re-lays the chunk axis on its
smaller mesh, completes the remaining steps, and decrypts.

The final decrypt and product words must be bit-identical to an unsharded
single-process oracle of the full chain — the checkpoint really is the
recovery unit, and resume is mesh-shape-independent.

Determinism notes:
  * the coordinator port is an ephemeral bind (port 0) passed to workers, so
    concurrent runs never collide;
  * the doomed worker holds the fault window open by waiting on a sentinel
    file the driver never writes — only its SIGKILL (or a 300 s safety cap)
    ends the wait, so the window cannot close early on a loaded host.

Run: python tools/fault_demo.py [--nproc N]      (driver; spawns workers)
"""

from __future__ import annotations

import argparse
import os
import pathlib
import signal
import socket
import subprocess
import sys
import time

LOCAL_DEVICES = 2
N_STEPS = 3          # multiply steps in the chain
FAULT_STEP = 2       # the last worker dies while this step is in flight


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


def worker(pid: int, workdir: str, port: int, nproc: int, sharded_ckpt: bool = False) -> int:
    import jax

    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
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
            # Mark the step in flight so the driver can kill the last worker
            # while its peers sit inside the step's collective.  The doomed
            # worker waits on a sentinel the driver never writes: only the
            # SIGKILL (or the safety cap) ends the wait, so the fault window
            # is deterministic regardless of host load.
            (wd / f"inflight_{pid}").write_text(str(os.getpid()))
            if pid == nproc - 1:
                cap = time.time() + 300
                while not (wd / "release").exists() and time.time() < cap:
                    time.sleep(0.1)
        acc = sharded_mul_broadcast(acc, op, mesh)  # chunks: 8 -> 16 -> 32 -> 64
        if sharded_ckpt:
            # Per-shard checkpoint: every process writes ONLY its own chunk
            # blocks — no gather, no process ever holds the global array.
            cio.save_state_sharded(
                wd / f"ckpt_step{step}", {"acc": Ciphertext(acc, ctx), "sk": sk}
            )
            multihost_utils.sync_global_devices(f"save{step}")  # all blocks on disk
            if pid == 0:
                (wd / f"done_step{step}").write_text("ok")
        else:
            # Gathered checkpoint (cross-process gather; rank 0 writes).
            full = multihost_utils.process_allgather(acc, tiled=True)
            if pid == 0:
                cio.save_state(
                    wd / f"ckpt_step{step}.npz",
                    {"acc": Ciphertext(jnp.asarray(full), ctx), "sk": sk},
                )
                (wd / f"done_step{step}").write_text("ok")
        multihost_utils.sync_global_devices(f"step{step}")
    return 0


def resume(workdir: str, sharded_ckpt: bool = False) -> int:
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
    ctx, acc0, ops, sk = _inputs()
    mesh = chunk_mesh(len(jax.devices()))  # 2 devices now, was N x 2
    if sharded_ckpt:
        # Re-lay the per-shard blocks directly onto the new (smaller) mesh:
        # each process reads only the block ranges its new shards cover.
        state = cio.load_state_sharded(wd / f"ckpt_step{last}", mesh=mesh)
        acc = state["acc"].wt
    else:
        state = cio.load_state(wd / f"ckpt_step{last}.npz")
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
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--sharded-ckpt", action="store_true",
                    help="per-shard checkpoints (save_state_sharded) instead "
                         "of the rank-0 gathered npz")
    args = ap.parse_args()
    if args.worker is not None:
        return worker(args.worker, args.workdir, args.port, args.nproc,
                      args.sharded_ckpt)
    if args.resume:
        return resume(args.workdir, args.sharded_ckpt)

    import tempfile

    nproc = args.nproc
    victim = nproc - 1
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={LOCAL_DEVICES}"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    extra = ["--sharded-ckpt"] if args.sharded_ckpt else []
    # Ephemeral coordinator port: bind 0, read the assignment, release it.
    # The release leaves a TOCTOU window (another process can claim the port
    # before jax.distributed's coordinator binds it), so an early worker death
    # before the fault step retries on a fresh port + fresh workdir.
    procs, wd, reached = [], None, False
    for attempt in range(3):
        wd = tempfile.mkdtemp(prefix="fault_demo_")
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        procs = [
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--worker", str(i),
                 "--workdir", wd, "--port", str(port), "--nproc", str(nproc)]
                + extra,
                env=env,
            )
            for i in range(nproc)
        ]
        # Wait until every worker has reached the fault step (the survivors
        # then wedge inside the step's collective, whose last participant is
        # parked on the sentinel wait).
        deadline = time.time() + 300
        while time.time() < deadline:
            if all(
                (pathlib.Path(wd) / f"inflight_{i}").exists() for i in range(nproc)
            ):
                reached = True
                break
            if any(p.poll() is not None for p in procs):
                break
            time.sleep(0.2)
        if reached:
            break
        for p in procs:
            if p.poll() is None:
                p.kill()
        for p in procs:
            p.wait(timeout=30)
        print(f"fault demo: attempt {attempt + 1} died before the fault step; "
              "retrying on a fresh port", flush=True)
    if not reached:
        print("fault demo: FAIL (never reached the fault step)")
        return 1
    try:
        time.sleep(0.5)  # let the survivors sink into the collective
        procs[victim].send_signal(signal.SIGKILL)  # the injected host loss
        procs[victim].wait(timeout=30)
        print(f"killed worker {victim} of {nproc} (pid {procs[victim].pid}) "
              f"mid-step {FAULT_STEP}", flush=True)

        # Survivors are wedged in a collective whose peer is gone; reap them
        # like a job scheduler tearing down the degraded job.
        time.sleep(1.0)
        for i in range(nproc):
            if i != victim and procs[i].poll() is None:
                procs[i].send_signal(signal.SIGKILL)
        for i in range(nproc):
            if i != victim:
                procs[i].wait(timeout=30)
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
        [sys.executable, os.path.abspath(__file__), "--resume", "--workdir", wd]
        + extra,
        env=env,
        timeout=300,
    )
    print("fault demo:", "OK" if r.returncode == 0 else "FAIL")
    return r.returncode


if __name__ == "__main__":
    sys.exit(main())
