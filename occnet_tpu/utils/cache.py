"""Persistent XLA compilation cache — compiles of the big models take minutes
on this toolchain, so every entrypoint enables the on-disk cache."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "/root/.cache/jax_comp_cache"):
    import jax

    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
