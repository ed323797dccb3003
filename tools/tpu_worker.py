"""Persistent TPU worker: executes queued python jobs in one process.

The axon tunnel admits one TPU client at a time and device-grant release is
slow, so spawning a fresh python per experiment serializes on multi-minute
claim handoffs.  This worker claims the device once and then executes job
files submitted to .tpuq/:

  submit:  write  .tpuq/<name>.py
  result:  worker writes .tpuq/<name>.out (stdout+stderr+traceback),
           then renames the job to .tpuq/<name>.done

Jobs run via exec() in a fresh namespace but share the process (and the jax
compile cache).  Poll for the .out file to collect results.
"""

import io
import contextlib
import pathlib
import time
import traceback

Q = pathlib.Path(__file__).resolve().parent.parent / ".tpuq"
Q.mkdir(exist_ok=True)

# Exit (and release the device claim) after this long without jobs, or
# immediately if .tpuq/STOP exists.  A lingering claim starves any other
# process (e.g. the round driver's bench run) for many minutes.
IDLE_TIMEOUT_S = 20 * 60

print("initializing jax/TPU...", flush=True)
import jax  # noqa: E402

print("devices:", jax.devices(), flush=True)
(Q / "READY").write_text(str(time.time()))
last_work = time.time()

while True:
    if (Q / "STOP").exists():
        print("STOP sentinel found; exiting", flush=True)
        break
    if time.time() - last_work > IDLE_TIMEOUT_S:
        print("idle timeout; exiting to release the device claim", flush=True)
        break
    # Only pick up jobs that have been quiescent for a second: a submitter
    # writing the file non-atomically (shell redirect, cross-fs mv) must not
    # have a partial/empty file executed and marked .done out from under it.
    # Stat once per candidate and tolerate the file vanishing between glob
    # and stat (submitter rename/delete) — a raised OSError here would kill
    # the worker loop and silently stall the queue.
    now = time.time()
    jobs = []
    for p in Q.glob("*.py"):
        if p.with_suffix(".done").exists():
            continue
        try:
            st = p.stat()
        except OSError:
            continue
        if st.st_size > 0 and now - st.st_mtime > 1.0:
            jobs.append(p)
    jobs.sort()
    if not jobs:
        time.sleep(0.5)
        continue
    last_work = time.time()
    job = jobs[0]
    print("running", job.name, flush=True)
    buf = io.StringIO()
    t0 = time.time()
    status = "ok"
    try:
        code = job.read_text()
        with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
            exec(compile(code, str(job), "exec"), {"__name__": "__tpu_job__"})
    except BaseException:
        status = "error"
        buf.write("\n" + traceback.format_exc())
    out = job.with_suffix(".out")
    out.write_text(f"# status={status} wall={time.time()-t0:.2f}s\n" + buf.getvalue())
    job.rename(job.with_suffix(".done"))
    print("finished", job.name, status, flush=True)
