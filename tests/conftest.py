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


# --- two-tier suite (VERDICT r3 weak #6) -------------------------------------
# The full suite is ~30-40 min on the one-core host; a fast contract tier
# must stay <= ~5 min so verify cycles don't pay the e2e/parallel cost per
# touch. Modules here hold the heavy e2e / multi-device / quantization-sweep
# tests; everything else is the fast tier.
#   fast tier:  python -m pytest tests/ -m "not slow" -x -q
#   full suite: python -m pytest tests/ -x -q
SLOW_MODULES = {
    "test_preemption", "test_moe", "test_sequence_parallel",
    "test_pipeline_parallel", "test_lora_stream", "test_libero_eval_e2e",
    "test_bridge_eval_e2e", "test_training_extras", "test_serving_tiers",
    "test_multilora", "test_mixed_quant", "test_sharded_serving",
    "test_training", "test_overfit", "test_decode_fastpath", "test_quant",
    "test_speculative", "test_13b_ratio", "test_vla_e2e", "test_phi",
    "test_llama", "test_gqa_and_frames", "test_dynamic_batching",
    "test_stacked_kv8", "test_full_pipeline", "test_vlm_pretraining",
    "test_interleave", "test_layer_mask", "test_hf_export",
    "test_trained_parity_helpers", "test_probe_planted",
    "test_real_weight_day", "test_multihost_real",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        module = item.nodeid.split("::", 1)[0].rsplit("/", 1)[-1]
        if module.removesuffix(".py") in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
