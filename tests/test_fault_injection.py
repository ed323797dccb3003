"""Fault injection: a host dies mid-collective; resume from checkpoint.

SURVEY.md §5 ("optional fault injection = dropping a host between steps"):
tools/fault_demo.py runs a real 2-process jax.distributed chain, SIGKILLs
worker 1 while worker 0 is inside the step's gather collective, then resumes
the chain from the last completed checkpoint on a smaller (2-device,
single-process) mesh and verifies the final product words and decrypt are
bit-identical to the unsharded no-fault oracle.
"""

import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).parent.parent


def test_host_loss_mid_step_then_resume():
    proc = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "fault_demo.py")],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(ROOT),
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-1000:])
    assert "fault demo: OK" in proc.stdout
    assert "killed worker 1" in proc.stdout
