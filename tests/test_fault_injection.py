"""Fault injection: a host dies mid-collective; resume from checkpoint.

SURVEY.md §5 ("optional fault injection = dropping a host between steps"):
tools/fault_demo.py runs a real N-process jax.distributed chain, SIGKILLs
the last worker while its peers are inside the step's collective, then
resumes the chain from the last completed checkpoint on a smaller (2-device,
single-process) mesh and verifies the final product words and decrypt are
bit-identical to the unsharded no-fault oracle.  N=2 is the minimal loss
topology; N=4 kills 1 of 4 with a live 3-peer collective left wedged.
"""

import pathlib
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).parent.parent


@pytest.mark.parametrize("nproc,sharded", [(2, False), (4, False), (4, True)])
def test_host_loss_mid_step_then_resume(nproc, sharded):
    """sharded=True: checkpoints are written per-shard by each process
    (save_state_sharded, no gather) and resumed onto the smaller mesh via
    load_state_sharded — the pod-scale checkpoint path under a host loss."""
    proc = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "fault_demo.py"),
         "--nproc", str(nproc)] + (["--sharded-ckpt"] if sharded else []),
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(ROOT),
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-1000:])
    assert "fault demo: OK" in proc.stdout
    assert f"killed worker {nproc - 1} of {nproc}" in proc.stdout
