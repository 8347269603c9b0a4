"""Cross-process distributed run (scripts/multiprocess_dryrun.py): 2 OS
processes x 2 virtual CPU devices joined via jax.distributed — the
coordination surface (gRPC service, cross-process collectives, per-host
grain shards, checkpoint barrier) that single-process mesh tests cannot
exercise."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "multiprocess_dryrun.py")


@pytest.mark.slow
def test_multiprocess_dryrun(tmp_path):
    # the driver spawns its own CPU-only subprocesses (it strips the axon
    # plugin env itself); 2x2 keeps the 1-CPU-host wall time tolerable
    proc = subprocess.run(
        [sys.executable, SCRIPT, "--nprocs", "2", "--devices", "2",
         "--out-dir", str(tmp_path)],
        capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\nstdout:\n{proc.stdout[-3000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}"
    )
    assert "multiprocess dryrun ok" in proc.stdout
