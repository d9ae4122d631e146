"""Preemption-safe checkpointing (training/preemption.py).

The reference loses everything since the last interval save when a TPU pod
is reclaimed; PreemptionGuard converts SIGTERM into one final checkpoint +
data cursor and a clean exit (scripts/train.py / scripts/finetune.py wiring).
"""

import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import pytest

from openvla_probe_tpu.training.preemption import PreemptionGuard

REPO = Path(__file__).resolve().parent.parent


def test_guard_flag_and_restore():
    prev = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as guard:
        assert not guard.preempted and not guard.should_exit(0)
        os.kill(os.getpid(), signal.SIGTERM)
        assert guard.preempted
        # single process: should_exit == flag, sticky
        assert guard.should_exit(1) and guard.should_exit(2)
    # context exit restored the previous handler
    assert signal.getsignal(signal.SIGTERM) is prev


def test_guard_sigint_flag():
    with PreemptionGuard(signals=(signal.SIGINT,)) as guard:
        os.kill(os.getpid(), signal.SIGINT)   # no KeyboardInterrupt raised
        assert guard.should_exit(0)


def test_second_signal_reraises_default():
    """A second delivery restores + re-raises so a hung save stays killable;
    for SIGINT the default action is KeyboardInterrupt."""
    guard = PreemptionGuard(signals=(signal.SIGINT,)).install()
    try:
        os.kill(os.getpid(), signal.SIGINT)
        assert guard.preempted
        with pytest.raises(KeyboardInterrupt):
            os.kill(os.getpid(), signal.SIGINT)
    finally:
        guard.restore()


def test_train_script_sigterm_checkpoints_and_exits(tmp_path):
    """End-to-end: SIGTERM mid-run -> final checkpoint at a non-interval
    step, clean exit code 0 (~1 min: tiny-model compile dominates)."""
    env = dict(
        os.environ,
        OVLA_PLATFORM="cpu",
        OVLA_HOST_DEVICE_COUNT="2",
        JAX_PLATFORMS="cpu",
        PYTHONUNBUFFERED="1",   # log lines must cross the pipe promptly
    )
    proc = subprocess.Popen(
        [sys.executable, str(REPO / "scripts" / "train.py"),
         "--vla.base_vlm", "dinosiglip-tiny-28px::llama-tiny",
         "--vla.data_mix", "dummy", "--vla.max_steps", "500",
         "--vla.per_device_batch_size", "1",
         "--save_interval", "100000",          # periodic saves never fire
         "--run_root_dir", str(tmp_path)],
        env=env, cwd=str(REPO),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        # wait for the first metrics push (step 10) so steps are flowing
        for line in proc.stdout:
            if "Global Step" in line:
                break
        else:
            pytest.fail("train.py never reached a training step")
        proc.send_signal(signal.SIGTERM)
        out_rest = proc.stdout.read()
        rc = proc.wait(timeout=240)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert rc == 0, f"exit code {rc}\n{out_rest[-2000:]}"
    assert "Preemption signal" in out_rest
    run_dirs = [d for d in tmp_path.iterdir() if d.is_dir()]
    assert len(run_dirs) == 1
    ckpts = list((run_dirs[0] / "checkpoints").iterdir())
    assert len(ckpts) == 1, ckpts
    # the checkpointed step is NOT an interval step and < max_steps
    from openvla_probe_tpu.training.checkpointing import parse_checkpoint_name

    step, _, _ = parse_checkpoint_name(ckpts[0].name)
    assert 0 < step < 500
