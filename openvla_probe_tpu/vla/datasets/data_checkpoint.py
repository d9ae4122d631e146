"""RLDS data-order checkpointing: save/restore the tf.data iterator state.

The reference has NO data-order recovery — on resume the RLDS stream restarts
from scratch (SURVEY.md §5: "RLDS stream restarts from scratch (no data-order
checkpointing)"), so a resumed run re-sees early data and skips whatever the
shuffle buffer held. This module closes that gap with tf.data's native
iterator checkpointing (`tf.train.Checkpoint` over the iterator): the
interleave positions, shuffle-buffer contents, and per-dataset read cursors
all round-trip.

Usage (one iterator per process; multi-host runs save per-process files keyed
by jax.process_index):

    it = CheckpointableIterator(dataset, ckpt_dir)   # tf.data.Dataset
    for frame in it: ...
    it.save(step)                                    # alongside model ckpts
    # on resume:
    it = CheckpointableIterator(dataset, ckpt_dir)
    it.restore_latest()

Caveat (inherent to tf.data): the dataset GRAPH must be rebuilt identically
(same mixture/kwargs) before restore — the checkpoint stores cursor state,
not the pipeline definition. `save()` therefore also writes a fingerprint of
the pipeline spec and `restore*` validates it loudly.
"""

from __future__ import annotations

import hashlib
import json
import re
from pathlib import Path
from typing import Any, Dict, Iterator, Optional, Union

from ...overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)

_CKPT_RE = re.compile(r"data-step-(\d+)(?:-\d+)?\.index$")


def pipeline_fingerprint(spec: Dict[str, Any]) -> str:
    """Stable hash of the pipeline-defining kwargs (mixture, weights, seeds,
    transform settings) — guards against restoring cursors into a different
    pipeline."""
    blob = json.dumps(spec, sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


class CheckpointableIterator:
    """tf.data iterator with save/restore of its full internal state."""

    def __init__(
        self,
        dataset,                                  # tf.data.Dataset
        ckpt_dir: Union[str, Path],
        pipeline_spec: Optional[Dict[str, Any]] = None,
        process_index: Optional[int] = None,
    ) -> None:
        import tensorflow as tf

        self._tf = tf
        self.ckpt_dir = Path(ckpt_dir)
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        if process_index is None:
            try:
                import jax

                process_index = jax.process_index()
            except Exception:
                process_index = 0
        self.process_index = int(process_index)
        self.fingerprint = pipeline_fingerprint(pipeline_spec or {})
        self.iterator = iter(dataset)
        self._ckpt = tf.train.Checkpoint(iterator=self.iterator)

    # --- iteration ---------------------------------------------------------
    def __iter__(self) -> Iterator[Dict[str, Any]]:
        return self

    def __next__(self) -> Dict[str, Any]:
        import tensorflow as tf

        nxt = self.iterator.get_next()
        return tf.nest.map_structure(lambda t: t.numpy(), nxt)

    # --- save / restore ----------------------------------------------------
    def _prefix(self, step: int) -> str:
        return str(self.ckpt_dir / f"data-step-{step}-{self.process_index}")

    def save(self, step: int) -> str:
        path = self._ckpt.write(self._prefix(step))
        meta = {"fingerprint": self.fingerprint, "step": step,
                "process_index": self.process_index}
        Path(path + ".meta.json").write_text(json.dumps(meta))
        return path

    def _available_steps(self):
        # strict parse: a glob like data-step-*-0.index would ALSO match
        # data-step-<s>-10.index ('*' absorbs '<s>-1'), crossing process
        # boundaries at >=10 hosts
        pat = re.compile(rf"^data-step-(\d+)-{self.process_index}\.index$")
        steps = []
        for p in self.ckpt_dir.iterdir():
            m = pat.match(p.name)
            if m:
                steps.append(int(m.group(1)))
        return sorted(set(steps))

    def restore(self, step: int) -> None:
        prefix = self._prefix(step)
        meta_path = Path(prefix + ".meta.json")
        if meta_path.exists():
            meta = json.loads(meta_path.read_text())
            if meta.get("fingerprint") != self.fingerprint:
                raise ValueError(
                    "Data checkpoint was written by a DIFFERENT pipeline "
                    f"(fingerprint {meta.get('fingerprint')} != {self.fingerprint}); "
                    "rebuild the same mixture/kwargs before restoring."
                )
        self._ckpt.read(prefix).assert_existing_objects_matched()
        overwatch.info(f"Restored data-order checkpoint at step {step}")

    def restore_latest(self) -> Optional[int]:
        steps = self._available_steps()
        if not steps:
            overwatch.warning("No data-order checkpoint found; starting fresh")
            return None
        self.restore(steps[-1])
        return steps[-1]
