"""JAX runtime setup helpers: persistent compilation cache, precision."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache — first compile of each program
    shape is written to disk and reused across processes (vital when the
    compiler is reached over a slow link)."""
    import jax

    path = path or os.environ.get("RVC_TPU_CACHE",
                                  os.path.expanduser("~/.cache/rvc_tpu_xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
