"""Test harness: force an 8-device virtual CPU mesh BEFORE jax initializes.

Multi-chip sharding paths are exercised on host CPU per the project test
strategy (SURVEY.md §4): ``xla_force_host_platform_device_count=8`` stands in
for an 8-chip TPU slice.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# The env var alone is NOT enough here: the axon TPU plugin overrides
# JAX_PLATFORMS at import time; config.update wins.
jax.config.update("jax_platforms", "cpu")
# fp32 parity tests need true-f32 matmuls; the default downcasts to bf16 passes
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
