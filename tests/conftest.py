"""Pytest config: force an 8-virtual-device CPU JAX for all tests.

The container's sitecustomize registers a remote TPU ("axon") PJRT backend at
interpreter startup, *before* pytest runs, and the backend is already
materialized by the time any conftest code can flip JAX_PLATFORMS. So we
re-exec pytest once with a cleaned environment:
  - PALLAS_AXON_POOL_IPS unset  -> sitecustomize skips TPU registration
  - JAX_PLATFORMS=cpu           -> CPU backend
  - 8 virtual CPU devices       -> multi-chip sharding tests without hardware
    (a capability the reference's NCCL path never had, SURVEY.md §4)

The exec happens in pytest_configure (not at import time) because pytest's
fd-level output capture is active while conftests load; exec'ing there would
hand the child a temp file as stdout. By pytest_configure, global capture is
suspended and fd 1 is the real stdout again.
"""

import os
import sys

_CHILD_FLAG = "MIGAN_TPU_TEST_CHILD"

# Make the repo root importable regardless of how pytest was invoked.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def pytest_configure(config):
    if os.environ.get(_CHILD_FLAG) == "1":
        return
    env = dict(os.environ)
    env[_CHILD_FLAG] = "1"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    sys.stdout.flush()
    sys.stderr.flush()
    argv = [sys.executable, "-m", "pytest"] + list(config.invocation_params.args)
    os.execvpe(sys.executable, argv, env)
