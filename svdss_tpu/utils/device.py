"""Device/runtime initialization helpers.

Enables JAX's persistent compilation cache so the handful of bucketed
kernel shapes (search lanes x read-length buckets, DP alignment buckets)
compile once per machine rather than once per process — the TPU compile
round-trip dominates small-run wall time otherwise.
"""

from __future__ import annotations

import os

_DONE = False


def init_device_runtime() -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax
    cache_dir = os.environ.get(
        "SVDSS_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "svdss_tpu_jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # cache is best-effort
        pass
