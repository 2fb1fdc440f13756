"""Persistent XLA compilation cache.

The solver/model programs take 2-4 minutes to compile; caching them on
disk makes repeat CLI invocations (and the driver's bench runs) start in
seconds. Call before the first compilation.
"""

from __future__ import annotations

import os

import jax


def enable_compilation_cache(path: str | None = None) -> str:
    path = path or os.environ.get(
        "HOUV_TPU_CACHE", os.path.expanduser("~/.cache/houv_tpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    return path
