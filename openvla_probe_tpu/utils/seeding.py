"""Deterministic seeding utilities (reference prismatic/util/torch_utils.py:30-95).

`set_global_seed` seeds every host-side RNG and returns a worker-init function
deriving per-worker seeds (the reference's dataloader-fork determinism);
`check_bfloat16_supported` exists for API parity — bf16 is native on every TPU
generation, so it is unconditionally True there.
"""

from __future__ import annotations

import os
import random
from typing import Callable, Optional

import numpy as np


def worker_init_function(worker_id: int, base_seed: Optional[int] = None) -> None:
    """Derive an independent, reproducible RNG stream per data worker."""
    base = base_seed if base_seed is not None else int(os.environ.get("EXPERIMENT_GLOBAL_SEED", 0))
    seed_seq = np.random.SeedSequence([base, worker_id])
    np.random.seed(seed_seq.generate_state(4))
    random.seed(int(seed_seq.generate_state(1)[0]))


def set_global_seed(seed: int, get_worker_init_fn: bool = False) -> Optional[Callable[[int], None]]:
    """Seed python/numpy (+ torch when present) and export the seed for workers."""
    assert np.iinfo(np.uint32).min < seed < np.iinfo(np.uint32).max, "invalid seed"
    os.environ["EXPERIMENT_GLOBAL_SEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)
    try:
        import torch

        torch.manual_seed(seed)
    except ImportError:
        pass
    return worker_init_function if get_worker_init_fn else None


def jax_key(seed: int):
    """The on-device RNG root: jax.random.key (threefry; splittable)."""
    import jax

    return jax.random.key(seed)


def check_bfloat16_supported() -> bool:
    """bf16 compute support check. TPUs support bf16 natively on the MXU
    (the reference's CUDA/NCCL version gating has no TPU analogue); on CPU
    XLA emulates it. Always True under JAX backends we target."""
    return True
