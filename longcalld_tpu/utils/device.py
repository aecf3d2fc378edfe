"""Device/runtime initialization: persistent XLA compilation cache.

The alignment and phasing kernels compile once per bucketed shape; on the
axon TPU backend a single compile costs seconds, so caching across processes
matters for CLI-style invocations.
"""

from __future__ import annotations

import os

_initialized = False


def init_device() -> None:
    global _initialized
    if _initialized:
        return
    _initialized = True
    import jax
    # some TPU plugins force-set jax_platforms at registration time,
    # silently overriding a user's JAX_PLATFORMS=cpu (observed on the
    # axon backend).  Re-pin the user's explicit choice before any
    # backend initializes — same workaround tests/conftest.py applies.
    envp = os.environ.get("JAX_PLATFORMS")
    if envp:
        try:
            jax.config.update("jax_platforms", envp)
        except Exception:
            pass
    cache_dir = os.environ.get(
        "LONGCALLD_TPU_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "longcalld_tpu_jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
