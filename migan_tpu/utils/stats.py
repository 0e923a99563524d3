"""Training telemetry: scalar stats with moment accumulation.

Re-implements the capability of the reference training_stats
(reference: torch_utils/training_stats.py:56-266): `report(name, value)`
accumulates [count, sum, sum-of-squares] moments per name; a Collector
snapshot exposes mean/std.

TPU-native difference: values arriving from a jitted step are already
global-batch means (jnp reductions under pjit ARE the cross-replica
all_reduce, SURVEY.md §2.9), so no explicit collective is needed here; for
multi-host aggregation wrap values with jax process_allgather before
reporting. Host-side accumulation is plain numpy.
"""

from __future__ import annotations

import re

from typing import Dict, Optional

import numpy as np


class StatsRegistry:
    def __init__(self):
        self._moments: Dict[str, np.ndarray] = {}

    def report(self, name: str, value) -> None:
        v = np.asarray(value, np.float64).reshape(-1)
        v = v[np.isfinite(v)]
        if v.size == 0:
            return
        m = self._moments.setdefault(name, np.zeros(3, np.float64))
        m += np.array([v.size, v.sum(), np.square(v).sum()])

    def report_dict(self, stats: Dict[str, float]) -> None:
        for k, v in stats.items():
            self.report(k, v)

    def pop(self) -> Dict[str, np.ndarray]:
        out = self._moments
        self._moments = {}
        return out


_default_registry = StatsRegistry()


def report(name: str, value) -> None:
    _default_registry.report(name, value)


def report0(name: str, value) -> None:
    """Rank-0-only report (reference training_stats.py:103-109); in the
    single-controller JAX model every host reports identically, so this is
    report() gated on process_index 0."""
    import jax

    if jax.process_index() == 0:
        report(name, value)


class Collector:
    """Snapshot mean/std per matching stat (reference :143-232)."""

    def __init__(self, regex: str = ".*", registry: Optional[StatsRegistry]
                 = None):
        self._regex = re.compile(regex)
        self._registry = registry or _default_registry
        self._cumulative: Dict[str, np.ndarray] = {}
        self._last: Dict[str, np.ndarray] = {}

    def update(self) -> None:
        deltas = self._registry.pop()
        self._last = {}
        for name, d in deltas.items():
            if not self._regex.fullmatch(name):
                continue
            c = self._cumulative.setdefault(name, np.zeros(3, np.float64))
            c += d
            self._last[name] = d

    def names(self):
        return list(self._last.keys())

    def mean(self, name: str) -> float:
        m = self._last.get(name)
        if m is None or m[0] == 0:
            return float("nan")
        return float(m[1] / m[0])

    def std(self, name: str) -> float:
        m = self._last.get(name)
        if m is None or m[0] == 0:
            return float("nan")
        mean = m[1] / m[0]
        var = max(m[2] / m[0] - mean * mean, 0.0)
        return float(np.sqrt(var))

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {name: {"num": float(self._last[name][0]),
                       "mean": self.mean(name), "std": self.std(name)}
                for name in self._last}


def default_collector(regex: str = ".*") -> Collector:
    return Collector(regex)
