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

import hashlib
import os

_DISABLED = ("off", "0", "none", "false")


def _host_fingerprint() -> str:
    """Short digest of the host CPU feature set. XLA:CPU serializes AOT
    machine code compiled for the *build* host's features; loading it on a
    host with a different feature set logs 'could lead to SIGILL' and can
    crash. Scoping the cache dir per feature-set makes stale cross-host
    entries unreachable instead of load-and-hope. TPU programs are keyed
    by the backend itself, but they share the dir, so scope everything."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # x86 lists "flags"; aarch64 lists "Features".
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.md5(feats.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    # platform.processor() is often "" on Linux; fold in machine+platform
    # so distinct architectures at least get distinct cache dirs.
    ident = f"{platform.machine()}|{platform.platform()}|{platform.processor()}"
    return hashlib.md5(ident.encode()).hexdigest()[:10]


def default_cache_dir() -> str:
    return os.path.join(
        os.path.expanduser("~"), ".cache", "migan_tpu",
        f"xla_cache_{_host_fingerprint()}")


def enable_persistent_cache(
    path: str | None = None,
    min_compile_time_secs: float | None = None,
) -> str | None:
    """Point JAX's persistent compilation cache at a writable directory.

    Returns the cache dir in use, or None when disabled. Safe to call more
    than once; errors (read-only FS, unsupported backend) degrade to a
    warning-free no-op — the cache is an optimization, never a requirement.

    ``min_compile_time_secs`` (or env ``MIGAN_TPU_COMPILE_CACHE_MIN_SECS``)
    sets the threshold below which XLA skips persisting a program; 0 caches
    everything (useful for tests, where probe programs compile in <0.1 s).
    """
    if path is None:
        path = os.environ.get("MIGAN_TPU_COMPILE_CACHE") or default_cache_dir()
    if str(path).strip().lower() in _DISABLED:
        return None
    try:
        if min_compile_time_secs is None:
            min_compile_time_secs = float(
                os.environ.get("MIGAN_TPU_COMPILE_CACHE_MIN_SECS", "0.1"))
    except ValueError:
        min_compile_time_secs = 0.1  # malformed env var: keep the default
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        # Cache everything that took meaningful compile time; the default
        # (1 s) would skip the small per-image demo programs that still
        # cost a tracing round-trip on the remote backend.
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(min_compile_time_secs))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None
    return str(path)
