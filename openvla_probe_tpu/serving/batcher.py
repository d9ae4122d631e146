"""Dynamic micro-batching for the action server.

The serving core is batched (one jit call serves B heterogeneous requests —
per-row prompts, per-row norm stats); the reference's server is strictly
bs=1 (FastAPI handler -> predict_action, vla-scripts/deploy.py:91-109). This
batcher converts concurrent HTTP requests into device batches:

  * a request arrives -> it opens a window of `max_wait_ms`
  * every request that arrives inside the window joins the batch
    (up to `max_batch`, grouped by image shape — XLA static shapes)
  * one `predict_action_batch` call serves the whole group

At the measured v5e numbers (int8: 81 ms @ B=1 vs 612 ms @ B=24 ~ 25 ms/req)
batching under concurrent load trades ~max_wait_ms of added latency for up to
~3.2x per-request cost reduction.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import numpy as np


@dataclass
class _Pending:
    image: np.ndarray
    prompt: str
    unnorm_key: Optional[str]
    event: threading.Event = field(default_factory=threading.Event)
    result: Optional[Dict[str, np.ndarray]] = None
    error: Optional[Exception] = None


class DynamicBatcher:
    """Collect concurrent predict_action requests into device batches."""

    def __init__(
        self,
        model: Any,                       # needs .predict_action_batch(...)
        max_batch: int = 24,
        max_wait_ms: float = 8.0,
    ) -> None:
        self.model = model
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()
        self.stats = {"requests": 0, "batches": 0, "max_seen_batch": 0}

    # --- client side ---------------------------------------------------
    def predict_action(
        self, image: np.ndarray, prompt: str, unnorm_key: Optional[str] = None,
        timeout: float = 60.0,
    ) -> Dict[str, np.ndarray]:
        if self._stop.is_set():
            raise RuntimeError("DynamicBatcher is shut down")
        p = _Pending(np.asarray(image, np.uint8), prompt, unnorm_key)
        self._q.put(p)
        if not p.event.wait(timeout):
            raise TimeoutError("predict_action batcher timed out")
        if p.error is not None:
            raise p.error
        return p.result

    # --- worker ----------------------------------------------------------
    def _gather(self) -> List[_Pending]:
        try:
            first = self._q.get(timeout=0.1)
        except queue.Empty:
            return []
        group = [first]
        deadline = time.monotonic() + self.max_wait_s
        while len(group) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt.image.shape != first.image.shape:
                # different image geometry = different XLA shape; serve it in
                # its own batch rather than recompiling this one
                self._q.put(nxt)
                break
            group.append(nxt)
        return group

    def _loop(self) -> None:
        while not self._stop.is_set():
            group = self._gather()
            if not group:
                continue
            try:
                results = self.model.predict_action_batch(
                    np.stack([p.image for p in group]),
                    [p.prompt for p in group],
                    [p.unnorm_key for p in group],
                )
                for p, r in zip(group, results):
                    p.result = r
            except Exception as e:  # noqa: BLE001
                for p in group:
                    p.error = e
            self.stats["requests"] += len(group)
            self.stats["batches"] += 1
            self.stats["max_seen_batch"] = max(self.stats["max_seen_batch"], len(group))
            for p in group:
                p.event.set()

    def shutdown(self) -> None:
        self._stop.set()
        self._worker.join(timeout=2.0)
        # fail anything still queued so callers error immediately instead of
        # blocking for their full timeout
        while True:
            try:
                p = self._q.get_nowait()
            except queue.Empty:
                break
            p.error = RuntimeError("DynamicBatcher shut down before serving request")
            p.event.set()
