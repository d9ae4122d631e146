"""Offline integration test of the one-command real-weight day
(scripts/real_weight_day.py, VERDICT r4 #4): the full stage chain runs
end-to-end against a TINY synthetic hub snapshot with OVLA_HUB_OFFLINE=1 —
exactly the dress-rehearsal mode, so the only untested step on a real
weight day is the download itself."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_snapshot(tmp_path_factory):
    from scripts import make_synthetic_snapshot as mss

    out = tmp_path_factory.mktemp("hub")
    mss.main(mss.SnapshotConfig(out=str(out), scale="tiny"))
    return out


def test_real_weight_day_chain_offline(tiny_snapshot, tmp_path):
    out_dir = tmp_path / "rwd"
    env = dict(os.environ, OVLA_HUB_OFFLINE="1", OVLA_PLATFORM="cpu",
               JAX_PLATFORMS="cpu")
    argv = [sys.executable, str(REPO / "scripts" / "real_weight_day.py"),
            "--repo", "openvla/openvla-7b",
            "--cache_dir", str(tiny_snapshot),
            "--out", str(out_dir),
            "--batch", "4", "--parity_batch", "4",
            "--n_images", "8", "--calls", "3",
            "--unnorm_key", "bridge_orig"]
    r = subprocess.run(argv, cwd=str(REPO), env=env, capture_output=True,
                       text=True, timeout=1800)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    final = json.loads([l for l in r.stdout.splitlines()
                        if l.startswith("{")][-1])
    assert final["real_weight_day"] == "complete"
    assert set(final["stages"]) == {"download", "load_smoke", "parity_int8",
                                    "parity_nibble", "serve_bench"}

    state = json.loads((out_dir / "STATE.json").read_text())
    assert state["done"]["download"]["skipped"] == "OVLA_HUB_OFFLINE=1"

    arts = [json.loads(l) for l in
            (out_dir / "artifacts.jsonl").read_text().splitlines()]
    stages = {a.get("stage") for a in arts}
    assert "load_smoke" in stages and "serve_bench" in stages
    smoke = next(a for a in arts if a.get("stage") == "load_smoke")
    assert smoke["finite"] and len(smoke["tokens"]) == 7
    # the two check_parity certificate lines rode --report into the ledger
    parity = [a for a in arts if "overall_agreement" in a]
    assert len(parity) == 2
    bench = next(a for a in arts if a.get("stage") == "serve_bench")
    assert bench["calls_per_s"] > 0 and bench["bs1_spec_accepted"] >= 0

    # resumability: a second invocation skips every stage
    r2 = subprocess.run(argv, cwd=str(REPO), env=env, capture_output=True,
                        text=True, timeout=600)
    assert r2.returncode == 0, r2.stderr[-1500:]
    assert r2.stdout.count("skipping") == 5
