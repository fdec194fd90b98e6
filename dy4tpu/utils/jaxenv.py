"""JAX environment setup shared by the CLIs and benchmarks."""

from __future__ import annotations

import os


def setup(platform_env: str = "DY4TPU_PLATFORM") -> None:
    """Apply platform override + persistent compilation cache.

    - ``DY4TPU_PLATFORM=cpu`` forces the platform via jax.config (the
      plain ``JAX_PLATFORMS`` env var is overridden when a TPU plugin
      pre-registers itself).
    - Enables the persistent XLA compilation cache (first full-receiver
      compile is ~1-2 min on TPU; cached reruns are seconds).
    """
    import jax

    plat = os.environ.get(platform_env)
    if plat:
        jax.config.update("jax_platforms", plat)
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.cache/dy4tpu-xla"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization only
