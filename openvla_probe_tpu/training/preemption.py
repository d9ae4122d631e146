"""Preemption-safe training: signal-triggered final checkpoint.

Cloud TPU pods surface maintenance events and spot/preemptible reclaims as
SIGTERM to the host processes, with a short grace window (~30 s on GCE)
before SIGKILL. The reference has no handler — a preempted run loses
everything since the last periodic save (its FSDP checkpoint cadence is
thousands of steps, i.e. hours of work; prismatic/training/strategies/
fsdp.py:95-133 only saves on the configured interval).

`PreemptionGuard` converts the signal into a cooperative flag the train
loop polls once per step: on the step after delivery the loop writes one
final checkpoint (plus the RLDS data cursor) and exits cleanly, so
`--is_resume` continues from the exact preempted step instead of the last
interval boundary.

Multi-host: a single-host SIGTERM must not desync the collective save —
every process has to agree on WHICH step is the final one. `should_exit`
therefore OR-reduces the local flag across processes (one tiny
all-gather) every `sync_every` steps; all hosts then enter the same save
together. With one process the check is a plain flag read (no collective,
nothing jittable touched — safe to call inside the Python loop).
"""

from __future__ import annotations

import signal
from typing import Iterable

import numpy as np


class PreemptionGuard:
    """Cooperative SIGTERM/SIGINT-to-flag bridge for training loops.

    Usage::

        with PreemptionGuard() as guard:
            while step < max_steps:
                ...train step...
                if guard.should_exit(step):
                    save_final_checkpoint(); break

    The handler only sets a flag (signal-safe); all checkpoint work happens
    in loop context. Previous handlers are restored on exit, and a SECOND
    signal re-raises the default behavior so a stuck save can still be
    interrupted (standard double-Ctrl-C semantics).
    """

    def __init__(
        self,
        signals: Iterable[int] = (signal.SIGTERM, signal.SIGINT),
        sync_every: int = 1,
    ) -> None:
        self._signals = tuple(signals)
        self._sync_every = max(1, int(sync_every))
        self._flag = False
        self._agreed = False
        self._prev: dict = {}

    # -- signal plumbing ---------------------------------------------------

    def _handler(self, signum, frame):
        if self._flag:
            # second delivery: restore + re-raise so the default action runs
            # (a hung collective save must remain killable in the grace window)
            self.restore()
            signal.raise_signal(signum)
            return
        self._flag = True

    def install(self) -> "PreemptionGuard":
        for s in self._signals:
            self._prev[s] = signal.signal(s, self._handler)
        return self

    def restore(self) -> None:
        for s, prev in self._prev.items():
            signal.signal(s, prev)
        self._prev = {}

    def __enter__(self) -> "PreemptionGuard":
        return self.install()

    def __exit__(self, *exc) -> None:
        self.restore()

    # -- loop interface ----------------------------------------------------

    @property
    def preempted(self) -> bool:
        """This process's local flag (no cross-host agreement)."""
        return self._flag

    def should_exit(self, step: int = 0) -> bool:
        """True once ALL processes agree a preemption signal arrived.

        Single-process: a plain flag read. Multi-host: OR-reduce the local
        flag across processes every `sync_every` steps (every host must call
        this at the same step cadence — it is a collective). Once agreement
        is reached it is sticky, so the loop's save-and-break runs exactly
        once on every host at the same step.
        """
        if self._agreed:
            return True
        import jax

        if jax.process_count() == 1:
            self._agreed = self._flag
            return self._agreed
        if step % self._sync_every:
            return False
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray(self._flag, dtype=np.bool_)
        )
        self._agreed = bool(np.any(flags))
        return self._agreed
