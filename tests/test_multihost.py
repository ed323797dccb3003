"""Multi-process SPMD: jax.distributed processes, cross-process collectives.

This is the real multi-host code path (BASELINE config 5's "N>=2 hosts"),
CPU-backed: separate OS processes, Gloo collectives, global mesh spanning
non-addressable devices.  N=2 covers the minimal topology; N=4 (8 global
devices) exercises non-trivial ring/all-gather fan-in.
"""

import pathlib
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).parent.parent


@pytest.mark.parametrize("nproc", [2, 4])
def test_multiprocess_sharded_mul_decrypt(nproc):
    proc = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "multihost_demo.py"),
         "--nproc", str(nproc)],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(ROOT),
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-1000:])
    assert "multihost demo: OK" in proc.stdout
    for pid in range(nproc):
        assert f"[proc {pid}]" in proc.stdout
