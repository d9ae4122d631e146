"""Checkpoint save/restore (orbax) with the reference's run-dir conventions.

Replaces the reference's FSDP full-state-dict rank-0 torch.save flow
(prismatic/training/strategies/fsdp.py:95-133) with orbax: sharded arrays are
written collectively (no rank-0 gather / CPU offload needed), and restore
re-shards to the current mesh automatically.

Run-dir layout mirrors the reference (train.py:133-138, 202-204):

    run_dir/
      config.json                      # model + train config
      dataset_statistics.json          # unnorm sidecar (rides with the ckpt)
      checkpoints/
        step-XXXXXX-epoch-YY-loss=Z.ZZZZ/     # orbax dir (reference: .pt file)

Resume: `latest_checkpoint` parses step/epoch from the directory name — the
same name-derived resume contract the reference validates
(vla-scripts/train.py:143-150).
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Dict, Optional, Tuple, Union

import jax
import orbax.checkpoint as ocp

_CKPT_RE = re.compile(r"step-(\d+)-epoch-(\d+)-loss=(-?[0-9.]+|nan|inf|-inf)\.?$")


def checkpoint_name(step: int, epoch: int = 0, loss: float = 0.0) -> str:
    import math

    # diverged runs produce nan/inf losses; the NAME must stay parseable so
    # latest_checkpoint/keep_limit still see the checkpoint
    loss = loss if math.isfinite(loss) else 0.0
    return f"step-{step:06d}-epoch-{epoch:02d}-loss={loss:.4f}"


def parse_checkpoint_name(name: str) -> Optional[Tuple[int, int, float]]:
    m = _CKPT_RE.match(name)
    if not m:
        return None
    return int(m.group(1)), int(m.group(2)), float(m.group(3))


def _prune_checkpoints(ckpt_dir: Path, keep_limit: int, just_written: Path) -> None:
    # prune on process 0 only (all hosts share the filesystem — concurrent
    # rmtree of the same dir races), and NEVER the just-written checkpoint
    # (a reused run_dir can contain higher-step checkpoints from a prior run)
    if jax.process_index() != 0:
        return
    all_ckpts = sorted(
        [p for p in ckpt_dir.iterdir() if parse_checkpoint_name(p.name)],
        key=lambda p: parse_checkpoint_name(p.name)[0],
    )
    for old in all_ckpts[:-keep_limit]:
        if old.absolute() == just_written:
            continue
        import shutil

        shutil.rmtree(old, ignore_errors=True)


def save_checkpoint(
    run_dir: Union[str, Path],
    state: Any,
    step: int,
    epoch: int = 0,
    loss: float = 0.0,
    keep_limit: Optional[int] = None,
) -> Path:
    """Write `state` (any pytree: TrainState or bare params) collectively."""
    run_dir = Path(run_dir)
    ckpt_dir = run_dir / "checkpoints"
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = (ckpt_dir / checkpoint_name(step, epoch, loss)).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    if keep_limit:
        _prune_checkpoints(ckpt_dir, keep_limit, path)
    return path


class AsyncCheckpointWriter:
    """Non-blocking checkpoint saves for the training loop.

    orbax AsyncCheckpointer semantics: `save` snapshots device arrays to host
    synchronously (the state is consistent no matter how training mutates it
    afterwards), then the filesystem write runs in a background thread while
    the next train steps proceed. At production scale the write is seconds to
    minutes of wall clock that the reference's flow spends fully stalled —
    FSDP full-state-dict gather + rank-0 torch.save blocks every rank for the
    whole serialize+write (prismatic/training/strategies/fsdp.py:95-133).

    At most ONE write is in flight: `save` first waits for the previous write
    (bounding host snapshot memory at one state copy) and prunes only after
    that write committed, so `keep_limit` never counts a checkpoint that
    might still fail. Call `wait()` (or `close`, or use as a context manager)
    after the loop so the final checkpoint is durable before the process
    exits. Multi-host: orbax runs its own cross-process barrier per save.
    """

    def __init__(self, keep_limit: Optional[int] = None) -> None:
        self.keep_limit = keep_limit
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        self._pending: Optional[Path] = None

    def save(
        self,
        run_dir: Union[str, Path],
        state: Any,
        step: int,
        epoch: int = 0,
        loss: float = 0.0,
    ) -> Path:
        self.wait()
        ckpt_dir = Path(run_dir) / "checkpoints"
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        path = (ckpt_dir / checkpoint_name(step, epoch, loss)).absolute()
        self._ckptr.save(path, args=ocp.args.StandardSave(state), force=True)
        self._pending = path
        return path

    def wait(self) -> None:
        """Block until the in-flight write (if any) is durable, then prune."""
        self._ckptr.wait_until_finished()
        if self._pending is not None and self.keep_limit:
            _prune_checkpoints(self._pending.parent, self.keep_limit, self._pending)
        self._pending = None

    def close(self) -> None:
        self.wait()
        self._ckptr.close()

    def __enter__(self) -> "AsyncCheckpointWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def latest_checkpoint(run_dir: Union[str, Path]) -> Optional[Path]:
    ckpt_dir = Path(run_dir) / "checkpoints"
    if not ckpt_dir.exists():
        return None
    cands = [(parse_checkpoint_name(p.name), p) for p in ckpt_dir.iterdir()]
    cands = [(meta, p) for meta, p in cands if meta is not None]
    if not cands:
        return None
    return max(cands, key=lambda mp: mp[0][0])[1]


def load_checkpoint(
    path: Union[str, Path],
    template: Any,
) -> Any:
    """Restore into the structure/shardings of `template` (abstract values OK:
    pass jax.eval_shape output device_put to target shardings for resharding)."""
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(Path(path).absolute(), template)


def save_run_config(run_dir: Union[str, Path], config: Dict[str, Any]) -> Path:
    run_dir = Path(run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)
    out = run_dir / "config.json"
    # rank-zero write: in a real multi-process run every process calls this
    # with identical content, but concurrent open("w") on a shared filesystem
    # can interleave/truncate (single home: parallel.distributed.is_primary)
    from ..parallel.distributed import is_primary

    if is_primary():
        with open(out, "w") as f:
            json.dump(config, f, indent=2, default=str)
    return out


def load_run_config(run_dir: Union[str, Path]) -> Dict[str, Any]:
    with open(Path(run_dir) / "config.json") as f:
        return json.load(f)
