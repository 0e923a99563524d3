"""Persistent XLA compilation cache (utils/compile_cache.py) — the TPU
analog of the reference's md5-cached CUDA plugin builds
(reference: torch_utils/custom_ops.py:80-110)."""

import os
import subprocess
import sys

from migan_tpu.utils.compile_cache import (
    default_cache_dir, enable_persistent_cache,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import os, sys
sys.path.insert(0, {repo!r})
from migan_tpu.utils.compile_cache import enable_persistent_cache
assert enable_persistent_cache() == {cache!r}
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
jax.jit(lambda x: (jnp.tanh(x) @ x.T).sum())(x).block_until_ready()
"""


def test_cache_populates_and_persists(tmp_path):
    cache = str(tmp_path / "xla_cache")
    env = dict(os.environ, MIGAN_TPU_COMPILE_CACHE=cache,
               MIGAN_TPU_COMPILE_CACHE_MIN_SECS="0",
               JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    code = _CHILD.format(repo=REPO, cache=cache)

    r1 = subprocess.run([sys.executable, "-c", code], env=env,
                        capture_output=True, text=True)
    assert r1.returncode == 0, r1.stderr
    entries = os.listdir(cache)
    assert entries, "first run wrote no cache entries"

    # Second process reuses (and does not grow) the cache for the same
    # program — the cross-run reuse the reference got from its build cache.
    r2 = subprocess.run([sys.executable, "-c", code], env=env,
                        capture_output=True, text=True)
    assert r2.returncode == 0, r2.stderr
    assert sorted(os.listdir(cache)) == sorted(entries)


def test_disable_via_env(monkeypatch, tmp_path):
    import jax

    monkeypatch.setenv("MIGAN_TPU_COMPILE_CACHE", "off")
    assert enable_persistent_cache() is None
    # explicit path wins over env
    prev = jax.config.jax_compilation_cache_dir
    try:
        p = str(tmp_path / "c")
        assert enable_persistent_cache(p) == p
        assert os.path.isdir(p)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_default_dir_is_user_scoped():
    assert default_cache_dir().startswith(os.path.expanduser("~"))
