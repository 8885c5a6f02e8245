"""Persistent XLA compilation cache (opt-in).

The shipped-size train step costs ~1.5 min of XLA/Mosaic compile per process
(and the in-memory cache dies with the process), so a persistent cache looks
attractive. MEASURED on the axon-tunneled backend it is a trap: a cold
compile of scripts/bench_train.py takes ~85-91 s, but a warm-cache rerun of
the identical graph takes >20 min in executable deserialization — slower
than recompiling. The cache therefore stays OFF unless explicitly requested
via env; on a directly-attached TPU host it behaves normally and is worth
turning on.

Entry points call :func:`enable_compilation_cache`; the library never
mutates global jax config on import.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Point jax at an on-disk compilation cache; returns the dir or None.

    Opt-in: a no-op unless ``path`` is given or ``QA_TIGER_CACHE_DIR`` /
    ``JAX_CACHE_DIR`` is set in the environment (values ``0``/``off``/
    ``none`` also disable). Best-effort: unknown config names on older jax
    are ignored.
    """
    path = (path or os.environ.get("QA_TIGER_CACHE_DIR")
            or os.environ.get("JAX_CACHE_DIR"))
    if not path or str(path).lower() in ("0", "off", "none"):
        return None
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        # cache everything that took meaningful compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - config names vary across versions
        return None
    return str(path)
