"""Logging: stdout tee to the run's log file (reference lib/log_service.py)
and jax.profiler trace annotations replacing torch record_function scopes
(SURVEY.md §5.1)."""

from __future__ import annotations

import contextlib
import os
from typing import Optional

_log_file: Optional[str] = None


def set_log_file(path: Optional[str]) -> None:
    global _log_file
    _log_file = path
    if path:
        os.makedirs(os.path.dirname(path), exist_ok=True)


def print_log(*console_info) -> None:
    """Print to stdout and append to the run log
    (reference lib/log_service.py:4-18)."""
    text = " ".join(str(i) for i in console_info)
    print(text)
    if _log_file is not None:
        with open(_log_file, "a") as f:
            f.write(text + "\n")


@contextlib.contextmanager
def trace_scope(name: str):
    """Named profiler scope (replaces torch.autograd.profiler
    record_function, reference torch_utils/misc.py:98-103)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def profiled_function(fn):
    """Decorator adding a trace annotation around fn."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with trace_scope(fn.__name__):
            return fn(*args, **kwargs)

    return wrapper
