"""Shared utilities (res_check, trace, device info, compile cache)."""
from __future__ import annotations

import os


def enable_compile_cache(path: str = "/tmp/flex_tpu_jax_cache") -> None:
    """Point JAX at the on-disk compilation cache.  Remote TPU compiles
    through the relay take 1-15 min per new executable; every entry point
    that may touch the chip (CLI, bench.py, experiments) calls this first
    so repeat runs pay only the cache lookup."""
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
