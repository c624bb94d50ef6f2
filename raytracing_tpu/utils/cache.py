"""Persistent XLA compile cache for bench / app / experiment runs.

The reference pays its compile cost at rustc time; this framework pays it
at XLA trace time, and on the tunneled TPU runtime a *remote* first
compile of a Pallas program has been observed to take 10-30 minutes. The
persistent compilation cache keys on the stable HLO fingerprint, so a
once-compiled kernel is reused across processes and sessions — repeat
bench runs become execution-bound (tests/conftest.py applies the same
setting for the CPU suite).

Call enable_persistent_cache() before the first jit dispatch; later calls
are no-ops. Honors an explicit JAX_COMPILATION_CACHE_DIR env var.
"""

from __future__ import annotations

import os

import jax

_ENABLED = False
DEFAULT_DIR = "/tmp/raytracing_tpu_xla_cache"


def enable_persistent_cache(path: str | None = None) -> str:
    """Point jax's persistent compilation cache at `path` (created if
    needed). Returns the cache directory in use."""
    global _ENABLED
    cache_dir = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or DEFAULT_DIR)
    if _ENABLED:
        return cache_dir
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything: tiny entries are still worth a 20 s remote round
    # trip, and the min-size default (>1 MB) would skip most kernels.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _ENABLED = True
    return cache_dir
