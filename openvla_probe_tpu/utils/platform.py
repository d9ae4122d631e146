"""Platform selection helper for CLI scripts.

`OVLA_PLATFORM=cpu [OVLA_HOST_DEVICE_COUNT=8]` forces the JAX backend before
initialization — needed because the axon TPU plugin overrides the plain
JAX_PLATFORMS env var. Call `apply_platform_env()` before any jax use.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    platform = os.environ.get("OVLA_PLATFORM")
    ndev = os.environ.get("OVLA_HOST_DEVICE_COUNT")
    if ndev:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={ndev}"
            ).strip()
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
