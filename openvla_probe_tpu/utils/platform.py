"""Platform selection helper for CLI scripts.

`OVLA_PLATFORM=cpu [OVLA_HOST_DEVICE_COUNT=8]` forces the JAX backend before
initialization — needed because the axon TPU plugin overrides the plain
JAX_PLATFORMS env var. Call `apply_platform_env()` before any jax use.

`OVLA_COMPILE_CACHE=<dir>` enables JAX's persistent compilation cache so a
serving/training restart reuses the prior process's XLA executables instead
of recompiling. The 7B serving graph takes minutes to compile cold (and
4-10 min through an axon tunnel); a cache hit is seconds — this is the
production cold-start story the torch reference gets for free from eager
mode (SURVEY.md §5 serving row; reference has no compile step at all).
"""

from __future__ import annotations

import os


def setup_compilation_cache(cache_dir: str,
                            min_compile_secs: float | None = None) -> None:
    """Point JAX's persistent executable cache at `cache_dir`.

    Must run before the first jit compilation to have any effect on it
    (later compilations still use the cache). Entries below
    `min_compile_secs` of compile time are not persisted (default 1.0 —
    skip trivial kernels, keep every real serving/training graph);
    `OVLA_COMPILE_CACHE_MIN_SECS` overrides. Entry-size gating stays at the
    JAX default unless `OVLA_COMPILE_CACHE_MIN_BYTES` is set (ADVICE r3:
    forcing -1 persisted every tiny kernel with no size guard). The cache
    dir grows without bound over many distinct shapes; it is always safe to
    delete between runs.
    """
    import jax

    if min_compile_secs is None:
        min_compile_secs = float(
            os.environ.get("OVLA_COMPILE_CACHE_MIN_SECS", "1.0"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    min_bytes = os.environ.get("OVLA_COMPILE_CACHE_MIN_BYTES")
    if min_bytes is not None:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          int(min_bytes))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))


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
    cache_dir = os.environ.get("OVLA_COMPILE_CACHE")
    if cache_dir:
        setup_compilation_cache(cache_dir)
