"""Persistent XLA compilation cache.

The FLIP step at 129^3 takes minutes to compile through the remote-TPU
tunnel (BENCH_r01: 728 s warmup); the reference pays nothing comparable
(g++ -O3 once, ``run.sh:3-5``).  Enabling JAX's persistent compilation
cache makes every process after the first hit the on-disk cache, cutting
bench/CLI warmup from ~12 min to seconds on a warm cache.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache")

_active_dir: str | None = None


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Idempotently enable the on-disk compile cache (safe pre/post jax import).

    Honors ``FLUIDSIM_CACHE_DIR``; set it to ``0`` / ``off`` to disable.
    Returns the directory JAX is actually using: once enabled, later calls
    return the first-configured path (with a warning on a conflicting
    request) rather than pretending the new path took effect.
    """
    global _active_dir
    env = os.environ.get("FLUIDSIM_CACHE_DIR")
    if env in ("0", "off", "none"):
        return ""
    path = cache_dir or env or _DEFAULT_DIR
    if _active_dir is not None:
        if os.path.abspath(path) != os.path.abspath(_active_dir):
            import warnings

            warnings.warn(
                f"compilation cache already enabled at {_active_dir}; "
                f"ignoring request for {path}", stacklevel=2)
        return _active_dir
    os.makedirs(path, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # Cache every compile, however small/fast — the tunnel round-trip
    # dominates even tiny compiles, and disk is cheap.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _active_dir = path
    return path
