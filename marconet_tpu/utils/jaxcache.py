"""Persistent XLA compilation cache setup.

Compiles of the full pipeline are expensive (minutes on remote-compile
TPU tunnels); enabling JAX's persistent cache makes every tool start
warm after the first run.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    # TPU only: CPU AOT cache entries on this setup can be produced with
    # machine-feature flags that do not match the executing host (observed
    # silent SIGILL-style process death when loading them back).
    try:
        if jax.default_backend() == "cpu":
            return
    except Exception:
        return
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                  os.path.expanduser("~/.cache/jax_comp"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags
