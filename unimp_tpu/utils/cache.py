"""Persistent XLA compilation cache.

Compiles through the remote-TPU tunnel take 30s-15min; the persistent
cache brings repeat compiles to seconds (measured 81s -> 2.8s). Enabled
by every entry point (bench, CLIs, driver hooks). Cache dir override:
UNIMP_JAX_CACHE.
"""

from __future__ import annotations

import os

_DONE = False


def enable_compilation_cache():
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax

    # CPU AOT artifacts are machine-feature sensitive (loading one compiled
    # with different CPU flags risks SIGILL); only the TPU compiles are
    # expensive enough to cache anyway.
    try:
        if jax.default_backend() != "tpu":
            return
    except Exception:
        return

    cache_dir = os.environ.get(
        "UNIMP_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "unimp_tpu", "jax_cache"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception as e:  # older jax without the flags
        print(f"[cache] compilation cache unavailable: {e}")
