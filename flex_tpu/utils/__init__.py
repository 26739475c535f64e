"""Shared utilities (res_check, trace, device info, compile cache)."""
from __future__ import annotations

import os


def enable_compile_cache(path: str = "/tmp/flex_tpu_jax_cache") -> None:
    """Point JAX at the on-disk compilation cache.  Remote TPU compiles
    through the relay take 1-15 min per new executable; every entry point
    that may touch the chip (CLI, bench.py, experiments) calls this first
    so repeat runs pay only the cache lookup.

    NB: /tmp does NOT survive between rounds (the round-4 driver capture
    started with an empty /tmp and paid 146 s of cold compiles).  The
    capture path (bench.py, __graft_entry__) therefore uses the
    repo-committed cache via :func:`enable_repo_compile_cache`; the /tmp
    default here is for dev-session experiments, whose one-off programs
    would bloat the committed cache."""
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    # Pallas/Mosaic kernel payloads embed the full dispatch traceback as
    # MLIR locations INSIDE the serialized kernel, where the cache key's
    # strip-debuginfo pass cannot reach — so editing any CALLER file
    # (e.g. bench.py) shifted line numbers and changed the persistent
    # key of every Pallas-containing executable (round-5 forensics:
    # identical code hit, any harness edit missed).  Single-frame
    # locations keep only the kernel-file frame, making keys
    # caller-independent.
    jax.config.update("jax_include_full_tracebacks_in_locations", False)


REPO_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_repo_compile_cache() -> None:
    """Compile cache that travels WITH the repo (committed to git), so a
    fresh driver machine hits warm executables for the whole capture path.
    Populated by ``python bench.py --warm`` at dev time."""
    enable_compile_cache(REPO_CACHE)
