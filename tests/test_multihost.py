"""Multi-process SPMD: 2 jax.distributed processes, cross-process collectives.

This is the real multi-host code path (BASELINE config 5's "N>=2 hosts"),
CPU-backed: separate OS processes, Gloo collectives, global mesh spanning
non-addressable devices.
"""

import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).parent.parent


def test_two_process_sharded_mul_decrypt():
    proc = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "multihost_demo.py")],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(ROOT),
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-1000:])
    assert "multihost demo: OK" in proc.stdout
