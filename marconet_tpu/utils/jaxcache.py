"""Persistent XLA compilation cache setup.

Compiles of the full pipeline are expensive (minutes on remote-compile
TPU tunnels); enabling JAX's persistent cache makes every tool start
warm after the first run.

The cache directory is keyed on the jax/jaxlib versions AND the runtime
platform build string (for TPU backends: the libtpu build). A cached AOT
executable produced under one libtpu build is invalid — and actively
harmful — under another (observed: FAILED_PRECONDITION libtpu version
mismatch killing runs after a rolling libtpu upgrade), so a build bump
must land in a fresh cache directory, never replay stale entries.
"""

from __future__ import annotations

import hashlib
import os


def host_cpu_fingerprint() -> str:
    """Hash of the host CPU's machine features.

    XLA:CPU AOT cache entries embed the compile machine's feature set;
    loading one on a different host generation warns ("+prefer-no-gather
    not supported on the host machine ... could lead to SIGILL") or
    kills the process. CPU cache directories (tests, dryrun) are keyed
    on this so a host change lands in a fresh directory.
    """
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        flags = ""
    return hashlib.sha1(
        (platform.machine() + "|" + flags).encode()).hexdigest()[:12]


def _platform_fingerprint() -> str:
    """Hash of everything that can invalidate a compiled executable."""
    import jax
    import jaxlib

    parts = [jax.__version__, getattr(jaxlib, "__version__", "?")]
    try:
        # e.g. "TFRT TPU v5 lite\nBuilt on Jan 12 2026 ... cl/854318611"
        parts.append(jax.devices()[0].client.platform_version)
    except Exception:
        parts.append("no-platform-version")
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:16]


def enable_compilation_cache(path: str | None = None) -> None:
    if os.environ.get("MARCONET_DISABLE_COMPILATION_CACHE"):
        return
    import jax

    # TPU only: CPU AOT cache entries on this setup can be produced with
    # machine-feature flags that do not match the executing host (observed
    # silent SIGILL-style process death when loading them back).
    try:
        if jax.default_backend() == "cpu":
            return
    except Exception:
        return
    base = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                  os.path.expanduser("~/.cache/jax_comp"))
    path = os.path.join(base, _platform_fingerprint())
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags
