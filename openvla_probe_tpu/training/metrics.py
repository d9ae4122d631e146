"""Training metrics + trackers (JSONL / W&B) for VLM and VLA runs.

Same public surface as the reference's metrics layer
(prismatic/training/metrics.py:25-348): `Tracker` protocol with JSONL and
Weights&Biases implementations, `Metrics` (loss/lr/step-time smoothing via
deques) and `VLAMetrics` (+ action accuracy, continuous L1, per-dataset
sub-metrics, resume counters). Runs host-side on process 0 only.
"""

from __future__ import annotations

import json
import time
from collections import defaultdict, deque
from pathlib import Path
from typing import Any, Dict, Optional, Protocol, Union

import numpy as np


class Tracker(Protocol):
    def write_hyperparameters(self, hparams: Dict[str, Any]) -> None: ...

    def write(self, global_step: int, metrics: Dict[str, Any]) -> None: ...

    def finalize(self) -> None: ...


class JSONLinesTracker:
    """run-metrics.jsonl + per-step jsonl, mirroring metrics.py:34-49."""

    def __init__(self, run_id: str, run_dir: Union[str, Path], hparams: Optional[Dict] = None) -> None:
        self.run_id, self.run_dir = run_id, Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self.hparams = hparams or {}

    def write_hyperparameters(self, hparams: Optional[Dict[str, Any]] = None) -> None:
        with open(self.run_dir / "run-metrics.jsonl", "a") as f:
            f.write(json.dumps({"run_id": self.run_id, "hparams": hparams or self.hparams}, default=str) + "\n")

    def write(self, global_step: int, metrics: Dict[str, Any]) -> None:
        with open(self.run_dir / f"{self.run_id}.jsonl", "a") as f:
            f.write(json.dumps({"step": global_step, **metrics}, default=float) + "\n")

    def finalize(self) -> None:
        pass


class WeightsBiasesTracker:
    """W&B tracker; degrades to a no-op when wandb is unavailable/offline."""

    def __init__(
        self, run_id: str, run_dir: Union[str, Path], hparams: Optional[Dict] = None,
        project: str = "openvla-tpu", entity: Optional[str] = None, group: str = "train",
    ) -> None:
        self.run_id, self.run_dir, self.hparams = run_id, Path(run_dir), hparams or {}
        try:
            import wandb

            self._wandb = wandb
            self._run = wandb.init(
                name=run_id, dir=str(run_dir), config=self.hparams,
                project=project, entity=entity, group=group,
            )
        except Exception:
            self._wandb = None
            self._run = None

    def write_hyperparameters(self, hparams: Optional[Dict[str, Any]] = None) -> None:
        if self._run is not None:
            self._run.config.update(hparams or self.hparams, allow_val_change=True)

    def write(self, global_step: int, metrics: Dict[str, Any]) -> None:
        if self._run is not None:
            self._wandb.log(metrics, step=global_step)

    def finalize(self) -> None:
        if self._run is not None:
            self._run.finish()


def _build_trackers(trackers, run_id, run_dir, hparams):
    # rank-zero file/W&B output only (reference: overwatch-gated trackers,
    # metrics.py:34-49): in a REAL multi-process run every process builds a
    # Metrics object for its local smoothing windows, but two processes
    # appending the same run_dir jsonl would interleave duplicate lines
    from ..parallel.distributed import is_primary

    if not is_primary():
        return []
    out = []
    for t in trackers:
        if t == "jsonl":
            out.append(JSONLinesTracker(run_id, run_dir, hparams))
        elif t == "wandb":
            out.append(WeightsBiasesTracker(run_id, run_dir, hparams))
        else:
            raise ValueError(f"Unknown tracker {t}")
    return out


class Metrics:
    """VLM-training metrics with smoothing windows (metrics.py:101-205)."""

    def __init__(
        self,
        active_trackers=("jsonl",),
        run_id: str = "run",
        run_dir: Union[str, Path] = "runs/run",
        hparams: Optional[Dict] = None,
        window_size: int = 128,
        stage: str = "finetune",
    ) -> None:
        self.run_id, self.run_dir = run_id, Path(run_dir)
        self.stage = stage
        self.global_step, self.start_time = 0, time.time()
        self.step_start_time = time.time()
        self.state = {
            "loss_raw": deque(maxlen=window_size),
            "loss": deque(maxlen=window_size),
            "step_time": deque(maxlen=window_size),
            "lr": [],
        }
        self.trackers = _build_trackers(active_trackers, run_id, run_dir, hparams)
        for t in self.trackers:
            t.write_hyperparameters(hparams)

    def log(self, global_step: int, metrics: Dict[str, Any]) -> None:
        for t in self.trackers:
            t.write(global_step, metrics)

    def get_status(self, loss: Optional[float] = None) -> str:
        lr = self.state["lr"][-1] if self.state["lr"] else 0
        status = f"=>> [Global Step] {self.global_step:06d} =>> LR :: {lr:.6f}"
        if loss is not None:
            status += f" -- Loss :: {loss:.4f}"
        return status

    def commit(self, *, global_step: Optional[int] = None, lr: Optional[float] = None,
               update_step_time: bool = False, **kwargs) -> None:
        if global_step is not None:
            self.global_step = global_step
        if lr is not None:
            self.state["lr"].append(lr)
        if update_step_time:
            self.state["step_time"].append(time.time() - self.step_start_time)
            self.step_start_time = time.time()
        for k, v in kwargs.items():
            v = float(np.asarray(v))
            if k == "loss":
                self.state["loss_raw"].append(v)
                self.state["loss"].append(v)
            else:
                self.state.setdefault(k, deque(maxlen=128)).append(v)

    def push(self) -> str:
        loss = float(np.mean(self.state["loss"])) if self.state["loss"] else float("nan")
        step_time = float(np.mean(self.state["step_time"])) if self.state["step_time"] else 0.0
        lr = self.state["lr"][-1] if self.state["lr"] else 0.0
        prefix = self.stage.capitalize()
        self.log(self.global_step, {
            f"{prefix}/Step": self.global_step,
            f"{prefix}/Loss": loss,
            f"{prefix}/Learning Rate": lr,
            f"{prefix}/Step Time": step_time,
        })
        return self.get_status(loss)

    def finalize(self) -> None:
        for t in self.trackers:
            t.finalize()


class VLAMetrics(Metrics):
    """VLA metrics: + L1, action accuracy, per-dataset splits, resume counters
    (metrics.py:208-348)."""

    def __init__(self, *args, resume_step: int = 0, resume_epoch: int = 0, **kwargs) -> None:
        super().__init__(*args, stage="vla-train", **kwargs)
        self.global_step = resume_step
        self.epoch = resume_epoch
        self.state["l1_loss"] = deque(maxlen=128)
        self.state["action_accuracy"] = deque(maxlen=128)
        self.dataset_trackers: Dict[str, Dict[str, deque]] = defaultdict(
            lambda: {"loss": deque(maxlen=128), "action_accuracy": deque(maxlen=128),
                     "l1_loss": deque(maxlen=128)}
        )

    def commit_for_dataset(self, dataset_name: str, **kwargs) -> None:
        dt = self.dataset_trackers[dataset_name]
        for k, v in kwargs.items():
            if k in dt:
                dt[k].append(float(np.asarray(v)))

    def commit_per_dataset_from_batch(self, dataset_names, per_example: Dict[str, Any]) -> None:
        """Group [B]-shaped per-example metrics by dataset_name and commit the
        per-dataset means — the reference's per-dataset tracker update
        (base_strategy.py:334-356) driven from on-device per-example arrays."""
        names = [n.decode() if isinstance(n, bytes) else str(n) for n in dataset_names]
        arrays = {k: np.asarray(v) for k, v in per_example.items()}
        for name in sorted(set(names)):
            idx = [i for i, nm in enumerate(names) if nm == name]
            self.commit_for_dataset(
                name, **{k: a[idx].mean() for k, a in arrays.items()}
            )

    def push(self) -> str:
        loss = float(np.mean(self.state["loss"])) if self.state["loss"] else float("nan")
        l1 = float(np.mean(self.state["l1_loss"])) if self.state["l1_loss"] else 0.0
        acc = float(np.mean(self.state["action_accuracy"])) if self.state["action_accuracy"] else 0.0
        step_time = float(np.mean(self.state["step_time"])) if self.state["step_time"] else 0.0
        lr = self.state["lr"][-1] if self.state["lr"] else 0.0
        payload = {
            "VLA Train/Step": self.global_step,
            "VLA Train/Epoch": self.epoch,
            "VLA Train/Loss": loss,
            "VLA Train/L1 Loss": l1,
            "VLA Train/Action Token Accuracy": acc,
            "VLA Train/Learning Rate": lr,
            "VLA Train/Step Time": step_time,
        }
        for name, dt in self.dataset_trackers.items():
            if dt["loss"]:
                payload[f"VLA Train/{name}/Loss"] = float(np.mean(dt["loss"]))
                payload[f"VLA Train/{name}/Action Token Accuracy"] = float(np.mean(dt["action_accuracy"])) if dt["action_accuracy"] else 0.0
        self.log(self.global_step, payload)
        return (f"=>> [Epoch {self.epoch:03d}] Global Step {self.global_step:06d} "
                f"=>> LR :: {lr:.6f} -- Loss :: {loss:.4f} -- Acc :: {acc:.4f}")
