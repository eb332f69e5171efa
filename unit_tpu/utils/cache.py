"""Persistent compile-cache setup, keyed by host machine features.

XLA:CPU AOT executables embed the build host's exact CPU feature set; loading
an entry written on a different machine risks SIGILL ("could lead to execution
errors" warnings in the round-4 dryrun tail).  Every cache consumer in the
repo routes through :func:`enable_compile_cache`, which namespaces the cache
directory by a hash of the host's cpuinfo flags: same-machine runs keep their
cache hits, cross-machine reuse becomes structurally impossible.
"""

from __future__ import annotations

import hashlib
import os
import platform

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def machine_cache_key() -> str:
    """Short hash of the host CPU's architecture + feature flags."""
    feats = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats += line
                    break
    except OSError:
        pass
    return hashlib.sha1(feats.encode()).hexdigest()[:12]


def enable_compile_cache(root: str | None = None, min_compile_secs: int = 10) -> str:
    """Point JAX's persistent compilation cache at a machine-keyed directory.

    Returns the directory used (best effort — a failure to configure is
    swallowed so callers never crash over a cache).
    """
    import jax

    path = os.path.join(root or _REPO_ROOT, ".jax_cache", machine_cache_key())
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
    except Exception:
        pass
    return path
