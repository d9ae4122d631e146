"""Background device-prefetch for training input pipelines.

The train loop's per-step host work — draining the RLDS iterator, collating
a padded batch, converting to device arrays — runs serially with the device
step in the reference's flow (its DataLoader workers only overlap the *read*,
not the final collate + H2D copy; prismatic/training/strategies/
base_strategy.py drives batches synchronously). On TPU the H2D copy and the
Python collate are pure host time that the MXU spends idle.

`DevicePrefetcher` moves the whole host tail (accumulate -> collate ->
device_put to the batch sharding) onto a background thread with a bounded
queue, so step N+1's batch is already device-resident when step N's
dispatch returns. Depth 2 is the classic double-buffer: one batch in
compute, one in flight. JAX API calls are thread-safe here — the thread
only builds committed arrays; all jit dispatch stays on the main thread.

Semantics:
  * ordering and contents are identical to the serial loop (FIFO queue),
  * exceptions in the producer (including StopIteration of a finite
    source) surface on the consumer at the matching position,
  * `close()` (or context-manager exit, or garbage collection of the
    consumer loop) stops the producer promptly even mid-put.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Optional

_STOP = object()


class DevicePrefetcher:
    """Iterate `make_batch()` results prepared on a background thread.

    Args:
      source: the per-example host iterator (e.g. an RLDS stream).
      batch_size: examples drained from `source` per batch.
      collate: list-of-examples -> host batch (dict of np arrays).
      to_device: host batch -> device-resident batch (e.g. the train loop's
        `to_global`, which device_puts to the dp sharding). Runs ON THE
        PRODUCER THREAD — this is the overlap being bought.
      depth: bounded queue size; 2 = double buffering (one batch in compute,
        one prepared). Larger only helps if batch prep time is bursty.
    """

    def __init__(
        self,
        source: Iterable[Any],
        batch_size: int,
        collate: Callable[[list], Any],
        to_device: Callable[[Any], Any],
        depth: int = 2,
    ) -> None:
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._src = iter(source)
        self._bs = batch_size
        self._collate = collate
        self._to_device = to_device
        self._thread = threading.Thread(
            target=self._produce, name="device-prefetch", daemon=True
        )
        self._thread.start()

    # -- producer ----------------------------------------------------------

    def _put(self, item) -> bool:
        """Bounded-queue put that honors close(); True if delivered."""
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _produce(self) -> None:
        try:
            while not self._stop.is_set():
                buf = []
                while len(buf) < self._bs:
                    buf.append(next(self._src))
                if not self._put(("ok", self._to_device(self._collate(buf)))):
                    return
        except BaseException as e:  # noqa: BLE001 — surfaced on the consumer
            self._put(("err", e))
        else:
            self._put((_STOP, None))

    # -- consumer ----------------------------------------------------------

    def __iter__(self) -> Iterator[Any]:
        return self

    def __next__(self) -> Any:
        if self._stop.is_set():
            raise StopIteration
        kind, payload = self._q.get()
        if kind == "ok":
            return payload
        self.close()
        if kind == "err":
            if isinstance(payload, StopIteration):
                raise StopIteration from payload
            raise payload
        raise StopIteration

    def close(self) -> None:
        """Stop the producer and join it; idempotent. Pending items are
        dropped. The join matters: a daemon thread still inside device_put
        when the interpreter finalizes aborts the process (native code on a
        dying thread), so close() waits for the in-flight batch. The timeout
        only triggers if the SOURCE blocks indefinitely (e.g. a stalled
        remote stream) — then the daemon flag is the backstop."""
        self._stop.set()
        # unblock a producer stuck in put() by draining one slot
        try:
            self._q.get_nowait()
        except queue.Empty:
            pass
        if threading.current_thread() is not self._thread:
            self._thread.join(timeout=10.0)

    def __enter__(self) -> "DevicePrefetcher":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
