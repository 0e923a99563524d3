"""Persistent XLA compilation cache for the CLIs.

The reference JIT-builds its CUDA ops once and reuses them across runs via
an md5-digest build cache + FileBaton (reference: torch_utils/custom_ops.py:80-110).
On TPU the JIT is XLA itself, and the equivalent production concern is the
20-40 s first-compile of the jitted programs every time a CLI process
starts. JAX's persistent compilation cache is the TPU-native answer: one
shared on-disk cache keyed by program fingerprint (concurrent writers are
safe — entries land under unique temp names and rename atomically, so no
FileBaton is needed).

Every CLI calls :func:`enable_persistent_cache` before building jitted
programs. Opt out (or relocate) with the ``MIGAN_TPU_COMPILE_CACHE`` env
var: a directory path, or ``off``/``0``/``none`` to disable.
"""

from __future__ import annotations

import os

_DISABLED = ("off", "0", "none", "false")


def default_cache_dir() -> str:
    return os.path.join(
        os.path.expanduser("~"), ".cache", "migan_tpu", "xla_cache")


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a writable directory.

    Returns the cache dir in use, or None when disabled. Safe to call more
    than once; errors (read-only FS, unsupported backend) degrade to a
    warning-free no-op — the cache is an optimization, never a requirement.
    """
    if path is None:
        path = os.environ.get("MIGAN_TPU_COMPILE_CACHE") or default_cache_dir()
    if str(path).strip().lower() in _DISABLED:
        return None
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        # Cache everything that took meaningful compile time; the default
        # (1 s) would skip the small per-image demo programs that still
        # cost a tracing round-trip on the remote backend.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None
    return str(path)
