"""bench.py artifact-on-every-exit contract (VERDICT r3 weak #1).

The driver runs bench under its own deadline and kills it with SIGTERM when
the budget runs out; round 3's BENCH_r03.json was rc=124 with NO JSON line.
These tests exercise the exit-guard machinery WITHOUT touching a backend:
the child processes import bench (module import pulls numpy only, never
jax), install the guards, and die in each of the ways the driver can kill
them. Every death must still produce exactly one parseable artifact line.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _last_artifact(stdout: str) -> dict:
    lines = [ln for ln in stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1, f"expected exactly ONE JSON line, got: {stdout!r}"
    return json.loads(lines[0])


def _spawn(body: str) -> subprocess.Popen:
    code = (
        "import sys, time; sys.path.insert(0, %r)\n"
        "import bench\n"
        "bench._install_exit_guards()\n" % REPO
    ) + body
    return subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                            text=True)


def test_sigterm_before_measurement_emits_error_artifact(tmp_path):
    proc = _spawn("print('ready', flush=True); time.sleep(60)\n")
    assert proc.stdout.readline().strip() == "ready"
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=30)
    art = _last_artifact(out)
    assert art["value"] == 0.0
    assert "signal" in art["error"]
    # exit code must still reflect the signal (timeout(1) reports 124 on its
    # own; bench must not mask a kill as success)
    assert proc.returncode != 0


def test_sigterm_after_headline_emits_pending_artifact():
    proc = _spawn(
        "bench._PENDING_ARTIFACT = {'metric': 'm', 'value': 46.7,"
        " 'unit': 'calls/s', 'vs_baseline': 1.56}\n"
        "print('ready', flush=True); time.sleep(60)\n")
    assert proc.stdout.readline().strip() == "ready"
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=30)
    art = _last_artifact(out)
    assert art["value"] == 46.7  # the measured headline, not an error


def test_plain_exit_without_artifact_emits_error_via_atexit():
    proc = _spawn("sys.exit(3)\n")
    out, _ = proc.communicate(timeout=30)
    art = _last_artifact(out)
    assert art["value"] == 0.0 and "error" in art


def test_emit_is_idempotent():
    proc = _spawn(
        "bench._emit({'value': 1.0}); bench._emit({'value': 2.0})\n")
    out, _ = proc.communicate(timeout=30)
    art = _last_artifact(out)  # asserts exactly one line
    assert art["value"] == 1.0


def test_stage_budgets_fit_inside_global_deadline(monkeypatch):
    """The three stages (backend wait, flash subprocess, main) must share
    BENCH_DEADLINE: with the default 1200 s budget the backend wait may take
    at most BENCH_BACKEND_WAIT yet never more than deadline minus the 2/3
    measurement reserve, and the flash slice keeps a fallback reserve."""
    sys.path.insert(0, REPO)
    import importlib

    import bench as b
    importlib.reload(b)
    monkeypatch.setenv("BENCH_DEADLINE", "1200")
    monkeypatch.setenv("BENCH_BACKEND_WAIT", "600")
    # fresh process start: remaining ~= 1200
    b._START = time.time()
    rem = b._remaining()
    assert 1195 < rem <= 1200
    wait_budget = min(600.0, rem - 0.66 * 1200)
    assert wait_budget <= 408  # reserve holds: wait can't eat the run
    flash = min(2100.0, rem - 420.0)
    assert flash + 420 <= rem + 1e-6


def test_bs1_extra_carries_acceptance_context():
    """VERDICT r4 #7: the bs=1 speculative bonus fields must carry their
    acceptance context (out-of-7 + random-weights qualifier) so the driver
    JSON's 79 ms-class number can't be read as a deployment latency."""
    sys.path.insert(0, REPO)
    import importlib

    import bench as b
    importlib.reload(b)
    extra = b._bs1_extra(0.07912, 2)
    assert extra == {
        "bs1_spec_p50_ms": 79.12,
        "bs1_spec_accepted": 2,
        "bs1_spec_accept_possible": 7,
        "random_weights": True,
    }


def test_error_artifact_schema():
    sys.path.insert(0, REPO)
    import importlib

    import bench as b
    importlib.reload(b)
    b._ARTIFACT_PRINTED = False
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        b._emit_error("boom")
    art = json.loads(buf.getvalue())
    assert art == {
        "metric": "predict_action calls/sec/chip (7-DoF @ 224px)",
        "value": 0.0, "unit": "calls/s", "vs_baseline": 0.0, "error": "boom",
    }
