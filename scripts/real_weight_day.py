#!/usr/bin/env python
"""ONE command for the real-weight validation day (VERDICT r4 #4).

The released-openvla-7b bit-exactness run (the build's #1 missing
validation, environment-blocked here by zero egress) decomposes into stages
this repo has individually dress-rehearsed at full 7B scale
(PARITY_r04.md). This script chains them into a single RESUMABLE entry
point so that wherever weights exist, the whole day is:

    nohup python scripts/real_weight_day.py \
        --repo openvla/openvla-7b [--hf_token ...] &

Stages (each a bounded subprocess; state in <out>/STATE.json; artifacts
appended incrementally to <out>/artifacts.jsonl; rerunning skips stages
already marked done — safe to Ctrl-C / nohup / re-invoke):

  download       hub snapshot (skipped under OVLA_HUB_OFFLINE=1 — the
                 dress-rehearsal mode against scripts/make_synthetic_snapshot)
  load_smoke     load_vla(repo, quantize_bits=<quant>) + one warm serving
                 call (the 822 s / 209 ms numbers of PARITY_r04.md)
  parity_int8    check_parity --checkpoint <snap>: bf16 bit-parity vs int8
                 turbo, full certificate JSON line (the released-weight
                 greedy action-token contract,
                 /root/reference/prismatic/extern/hf/modeling_prismatic.py:506-536)
  parity_nibble  same harness against the nibble tier's serving numerics
  serve_bench    real-weight B=24 throughput + bs=1 speculative robot-loop
                 latency on the loaded checkpoint (the trained/real-weight
                 analogue of bench.py's random-weight headline)

`--stages a,b,c` runs a subset; `--reset` clears state. Every stage is
offline-testable: tests/test_real_weight_day.py drives the full chain
against a tiny synthetic hub snapshot with OVLA_HUB_OFFLINE=1.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from openvla_probe_tpu.conf.registry import parse_config  # noqa: E402


@dataclass(frozen=True)
class RealWeightConfig:
    repo: str = "openvla/openvla-7b"
    out: str = "runs/real_weight_day"
    cache_dir: Optional[str] = None      # hub cache (synthetic snapshot root)
    hf_token: Optional[str] = None
    quant: str = "nibble"                # serving tier for load_smoke/bench
    batch: int = 24                      # serve_bench batch
    parity_batch: int = 4                # bf16 7B needs <=4 (PERF_r04.md)
    n_images: int = 32
    calls: int = 20
    stages: str = "all"
    stage_timeout_s: int = 5400          # per stage (tunnel loads run ~900 s)
    reset: bool = False
    unnorm_key: Optional[str] = "bridge_orig"


def _state_path(cfg) -> Path:
    return Path(cfg.out) / "STATE.json"


def _load_state(cfg) -> dict:
    p = _state_path(cfg)
    if cfg.reset and p.exists():
        p.unlink()
    if p.exists():
        return json.loads(p.read_text())
    return {"done": {}, "repo": cfg.repo}


def _mark(cfg, state, stage, info) -> None:
    state["done"][stage] = {"at": time.strftime("%F %T"), **info}
    p = _state_path(cfg)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps(state, indent=2))


def _append_artifact(cfg, line: dict) -> None:
    out = Path(cfg.out) / "artifacts.jsonl"
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "a") as f:
        f.write(json.dumps(line) + "\n")


def _run(cfg, tag: str, argv: list, env_extra: dict = None) -> str:
    """Bounded subprocess; full log to <out>/<tag>.log; returns stdout."""
    log = Path(cfg.out) / f"{tag}.log"
    log.parent.mkdir(parents=True, exist_ok=True)
    env = dict(os.environ, **(env_extra or {}))
    t0 = time.time()
    r = subprocess.run(argv, cwd=str(REPO), env=env, capture_output=True,
                       text=True, timeout=cfg.stage_timeout_s)
    log.write_text(r.stdout + "\n--- stderr ---\n" + r.stderr)
    if r.returncode != 0:
        raise RuntimeError(
            f"stage {tag} failed rc={r.returncode} after "
            f"{time.time() - t0:.0f}s — see {log}\n{r.stderr[-1500:]}")
    return r.stdout


def _snapshot_path(cfg) -> str:
    """Resolve the snapshot dir (download stage must have run, or offline)."""
    from openvla_probe_tpu.models.load import _hub_snapshot

    return str(_hub_snapshot(cfg.repo, cfg.cache_dir, cfg.hf_token))


def stage_download(cfg, state) -> dict:
    if os.environ.get("OVLA_HUB_OFFLINE", "0") == "1":
        snap = _snapshot_path(cfg)
        return {"skipped": "OVLA_HUB_OFFLINE=1", "snapshot": snap}
    snap = _snapshot_path(cfg)      # snapshot_download: the actual download
    return {"snapshot": snap}


def stage_load_smoke(cfg, state) -> dict:
    code = f"""
import json, os, sys, time
sys.path.insert(0, {str(REPO)!r})
from openvla_probe_tpu.utils.platform import apply_platform_env
apply_platform_env()   # honor OVLA_PLATFORM=cpu (axon overrides JAX_PLATFORMS)
import numpy as np
from openvla_probe_tpu.models.load import load_vla
t0 = time.time()
model = load_vla({cfg.repo!r}, cache_dir={cfg.cache_dir!r},
                 hf_token={cfg.hf_token!r}, quantize_int8=True,
                 quantize_bits={cfg.quant!r})
load_s = time.time() - t0
img = np.random.default_rng(0).integers(0, 256, (224, 224, 3), dtype=np.uint8)
kw = dict(unnorm_key={cfg.unnorm_key!r}) if {cfg.unnorm_key!r} else {{}}
t0 = time.time()
out = model.predict_action(img, "put spoon on towel", **kw)
compile_s = time.time() - t0
t0 = time.time()
out = model.predict_action(img, "put spoon on towel", **kw)
warm_ms = (time.time() - t0) * 1e3
print(json.dumps({{"stage": "load_smoke", "load_s": round(load_s, 1),
                  "first_call_s": round(compile_s, 1),
                  "warm_bs1_ms": round(warm_ms, 2),
                  "tokens": np.asarray(out["action_tokens"]).tolist(),
                  "finite": bool(np.isfinite(np.asarray(out["actions"],
                                             np.float64)).all())}}))
"""
    out = _run(cfg, "load_smoke", [sys.executable, "-c", code])
    line = json.loads([l for l in out.splitlines() if l.startswith("{")][-1])
    _append_artifact(cfg, line)
    return line


def _parity(cfg, bits, tag) -> dict:
    snap = _snapshot_path(cfg)
    report = str(Path(cfg.out) / "artifacts.jsonl")
    out = _run(cfg, tag, [
        sys.executable, str(REPO / "scripts" / "check_parity.py"),
        "--checkpoint", snap, "--bits", str(bits),
        "--batch", str(cfg.parity_batch),
        "--turbo_batch", str(max(cfg.parity_batch, 8)),
        "--n_images", str(cfg.n_images), "--report", report,
    ] + (["--unnorm_key", cfg.unnorm_key] if cfg.unnorm_key else []))
    line = json.loads([l for l in out.splitlines() if l.startswith("{")][-1])
    return {"tag": tag, **line}


def stage_parity_int8(cfg, state) -> dict:
    return _parity(cfg, 8, "parity_int8")


def stage_parity_nibble(cfg, state) -> dict:
    return _parity(cfg, "nibble", "parity_nibble")


def stage_serve_bench(cfg, state) -> dict:
    code = f"""
import json, sys, time
sys.path.insert(0, {str(REPO)!r})
from openvla_probe_tpu.utils.platform import apply_platform_env
apply_platform_env()
import numpy as np
from openvla_probe_tpu.models.load import load_vla
model = load_vla({cfg.repo!r}, cache_dir={cfg.cache_dir!r},
                 hf_token={cfg.hf_token!r}, quantize_int8=True,
                 quantize_bits={cfg.quant!r})
B = {cfg.batch}
rng = np.random.default_rng(0)
imgs = rng.integers(0, 256, (B, 224, 224, 3), dtype=np.uint8)
prompts = ["In: What action should the robot take to put spoon on towel?\\nOut:"] * B
kw = dict(unnorm_keys=[{cfg.unnorm_key!r}] * B) if {cfg.unnorm_key!r} else {{}}
_ = model.predict_action_batch(imgs, prompts, **kw)   # compile
for _ in range(2):
    _ = model.predict_action_batch(imgs, prompts, **kw)
t0 = time.time()
for _ in range({cfg.calls}):
    out = model.predict_action_batch(imgs, prompts, **kw)
dt = (time.time() - t0) / {cfg.calls}
# bs=1 speculative robot loop (self-consistent draft, turbo tier)
kw1 = dict(unnorm_key={cfg.unnorm_key!r}) if {cfg.unnorm_key!r} else {{}}
o1 = model.predict_action(imgs[0], "put spoon on towel", **kw1)
draft = np.asarray(o1["action_tokens"]).reshape(-1)
o1 = model.predict_action(imgs[0], "put spoon on towel",
                          draft_tokens=draft, **kw1)
draft = np.asarray(o1["action_tokens"]).reshape(-1)
t0 = time.time()
for _ in range(20):
    o1 = model.predict_action(imgs[0], "put spoon on towel",
                              draft_tokens=draft, **kw1)
spec_ms = (time.time() - t0) / 20 * 1e3
print(json.dumps({{"stage": "serve_bench", "quant": {cfg.quant!r},
                  "batch": B, "calls_per_s": round(B / dt, 3),
                  "p50_latency_ms": round(dt * 1e3, 2),
                  "bs1_spec_p50_ms": round(spec_ms, 2),
                  "bs1_spec_accepted": int(np.asarray(o1["n_accepted"]).reshape(-1)[0])}}))
"""
    out = _run(cfg, "serve_bench", [sys.executable, "-c", code])
    line = json.loads([l for l in out.splitlines() if l.startswith("{")][-1])
    _append_artifact(cfg, line)
    return line


STAGES = [
    ("download", stage_download),
    ("load_smoke", stage_load_smoke),
    ("parity_int8", stage_parity_int8),
    ("parity_nibble", stage_parity_nibble),
    ("serve_bench", stage_serve_bench),
]


def main(cfg: RealWeightConfig) -> None:
    state = _load_state(cfg)
    wanted = ([s for s, _ in STAGES] if cfg.stages == "all"
              else [s.strip() for s in cfg.stages.split(",")])
    unknown = set(wanted) - {s for s, _ in STAGES}
    if unknown:
        raise ValueError(f"unknown stages {sorted(unknown)}; "
                         f"have {[s for s, _ in STAGES]}")
    for name, fn in STAGES:
        if name not in wanted:
            continue
        if name in state["done"]:
            print(f"[real_weight_day] {name}: already done "
                  f"({state['done'][name]['at']}) — skipping", flush=True)
            continue
        print(f"[real_weight_day] {name}: running...", flush=True)
        t0 = time.time()
        info = fn(cfg, state)
        _mark(cfg, state, name, {"wall_s": round(time.time() - t0, 1),
                                 **{k: v for k, v in info.items()
                                    if isinstance(v, (str, int, float, bool))}})
        print(f"[real_weight_day] {name}: done in {time.time() - t0:.0f}s",
              flush=True)
    print(json.dumps({"real_weight_day": "complete",
                      "stages": list(state["done"]),
                      "artifacts": str(Path(cfg.out) / 'artifacts.jsonl')}))


if __name__ == "__main__":
    main(parse_config(RealWeightConfig))
