"""Persistent-compile-cache enablement that actually works on this image.

This image's site hook imports jax at interpreter startup, BEFORE any
user code runs — so the usual `os.environ.setdefault("JAX_COMPILATION_
CACHE_DIR", ...)` prologue is a silent no-op: jax's config reads the
env var at import time, which has already happened. Rounds 1-4 ran with
an EMPTY cache dir because of this (every test/bench/dryrun recompiled
everything from scratch). Setting the config values through
jax.config.update() after import works regardless of import order and
does not initialize any backend.
"""

import os

_DEFAULT_DIR = "/root/.cache/x264tpu_jaxcache"


def ensure_compile_cache(path: str | None = None) -> None:
    import jax
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                  _DEFAULT_DIR)
    try:
        if jax.config.jax_compilation_cache_dir != path:
            jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these knobs: cache stays best-effort
