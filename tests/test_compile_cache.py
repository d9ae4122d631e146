"""Persistent XLA compilation cache wiring (utils/platform.py).

The torch reference has no compile step, so cold-start is free there; the
TPU build pays minutes of XLA compilation for the 7B serving graph on every
fresh process. `OVLA_COMPILE_CACHE=<dir>` must make that a one-time cost:
executables persist to disk and a restarted server/bench reuses them.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvla_probe_tpu.utils.platform import (apply_platform_env,
                                              setup_compilation_cache)


@pytest.fixture
def restore_cache_config():
    # capture the ACTUAL pre-test values (ADVICE r3: restoring hardcoded
    # assumed defaults silently leaks config if JAX's defaults change or
    # another fixture set these first)
    before = {
        "jax_compilation_cache_dir": jax.config.jax_compilation_cache_dir,
        "jax_persistent_cache_min_entry_size_bytes":
            jax.config.jax_persistent_cache_min_entry_size_bytes,
        "jax_persistent_cache_min_compile_time_secs":
            jax.config.jax_persistent_cache_min_compile_time_secs,
    }
    yield
    for name, value in before.items():
        jax.config.update(name, value)


def test_setup_writes_executables(tmp_path, restore_cache_config):
    cache_dir = tmp_path / "xla_cache"
    setup_compilation_cache(str(cache_dir), min_compile_secs=0.0)
    assert cache_dir.is_dir()

    # unique shape so this compilation cannot already be in-memory cached
    @jax.jit
    def f(x):
        return x @ x.T + jnp.tanh(x).sum()

    out = np.asarray(f(jnp.ones((37, 53), jnp.float32)))
    assert np.isfinite(out).all()
    entries = list(cache_dir.iterdir())
    assert entries, "persistent cache dir stayed empty after a jit compile"


def test_apply_platform_env_wires_cache(tmp_path, restore_cache_config,
                                        monkeypatch):
    cache_dir = tmp_path / "env_cache"
    monkeypatch.setenv("OVLA_COMPILE_CACHE", str(cache_dir))
    monkeypatch.setenv("OVLA_COMPILE_CACHE_MIN_SECS", "2.5")
    apply_platform_env()
    assert jax.config.jax_compilation_cache_dir == str(cache_dir)
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 2.5
    assert cache_dir.is_dir()


def test_entry_size_respects_default_and_env(tmp_path, restore_cache_config,
                                             monkeypatch):
    # without the env knob, entry-size gating is left at whatever JAX has
    before = jax.config.jax_persistent_cache_min_entry_size_bytes
    monkeypatch.delenv("OVLA_COMPILE_CACHE_MIN_BYTES", raising=False)
    setup_compilation_cache(str(tmp_path / "a"), min_compile_secs=0.0)
    assert jax.config.jax_persistent_cache_min_entry_size_bytes == before
    # with the knob, it is applied
    monkeypatch.setenv("OVLA_COMPILE_CACHE_MIN_BYTES", "4096")
    setup_compilation_cache(str(tmp_path / "b"), min_compile_secs=0.0)
    assert jax.config.jax_persistent_cache_min_entry_size_bytes == 4096


def test_env_absent_is_noop(monkeypatch):
    monkeypatch.delenv("OVLA_COMPILE_CACHE", raising=False)
    before = jax.config.jax_compilation_cache_dir
    apply_platform_env()
    assert jax.config.jax_compilation_cache_dir == before
