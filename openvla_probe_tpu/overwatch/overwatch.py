"""Rank-aware logging + distributed-context accessors for multi-host TPU jobs.

TPU-native counterpart of the reference "overwatch" layer
(reference: prismatic/overwatch/overwatch.py:47-147): instead of wrapping
``accelerate.PartialState`` / torch.distributed, process identity comes from
``jax.process_index()`` / ``jax.process_count()``.  The logger is lazy about
touching JAX so it can be constructed before ``jax.distributed.initialize``.
"""

from __future__ import annotations

import logging
import os
import sys
from functools import wraps
from typing import Any, Callable

_LOG_FORMAT = "%(asctime)s | %(levelname)-7s | %(name)s :: %(message)s"
_DATE_FORMAT = "%H:%M:%S"


def _jax_process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return int(os.environ.get("JAX_PROCESS_INDEX", 0))


def _jax_process_count() -> int:
    try:
        import jax

        return jax.process_count()
    except Exception:
        return int(os.environ.get("JAX_PROCESS_COUNT", 1))


class Overwatch:
    """Process-zero-filtered logger + distributed-state accessors.

    Mirrors the public surface of the reference's ``DistributedOverwatch`` /
    ``PureOverwatch`` (rank()/world_size()/is_rank_zero()/rank_zero_only()),
    mapped onto JAX process semantics.
    """

    def __init__(self, name: str) -> None:
        self.logger = logging.getLogger(name)
        if not self.logger.handlers:
            handler = logging.StreamHandler(sys.stderr)
            handler.setFormatter(logging.Formatter(_LOG_FORMAT, datefmt=_DATE_FORMAT))
            self.logger.addHandler(handler)
        level = os.environ.get("OVERWATCH_LEVEL", "INFO").upper()
        self.logger.setLevel(level)
        self.logger.propagate = False

    # --- distributed state -------------------------------------------------
    def rank(self) -> int:
        return _jax_process_index()

    def world_size(self) -> int:
        return _jax_process_count()

    def local_rank(self) -> int:
        # one JAX process per host: local rank is always 0 w.r.t. host processes
        return int(os.environ.get("JAX_LOCAL_RANK", 0))

    def is_rank_zero(self) -> bool:
        return self.rank() == 0

    def rank_zero_only(self, fn: Callable[..., Any]) -> Callable[..., Any]:
        """Decorator: run `fn` only on process 0, return None elsewhere."""

        @wraps(fn)
        def wrapper(*args: Any, **kwargs: Any) -> Any:
            if self.is_rank_zero():
                return fn(*args, **kwargs)
            return None

        return wrapper

    # --- logging (process-zero filtered) -----------------------------------
    def _log(self, level: int, msg: str, *args: Any, all_ranks: bool = False, **kwargs: Any) -> None:
        if all_ranks or self.is_rank_zero():
            self.logger.log(level, msg, *args, **kwargs)

    def debug(self, msg: str, *args: Any, **kwargs: Any) -> None:
        self._log(logging.DEBUG, msg, *args, **kwargs)

    def info(self, msg: str, *args: Any, **kwargs: Any) -> None:
        self._log(logging.INFO, msg, *args, **kwargs)

    def warning(self, msg: str, *args: Any, **kwargs: Any) -> None:
        self._log(logging.WARNING, msg, *args, **kwargs)

    def error(self, msg: str, *args: Any, **kwargs: Any) -> None:
        self._log(logging.ERROR, msg, *args, **kwargs)


def initialize_overwatch(name: str) -> Overwatch:
    return Overwatch(name)
