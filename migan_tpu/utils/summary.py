"""Parameter-tree summary printer.

Capability analog of the reference's hook-based module table
(reference: torch_utils/misc.py:192-260 print_module_summary) for functional
pytrees: per-subtree parameter counts, shapes of the largest tensors, and a
total, plus the param-count/sum logging done at model construction
(reference: lib/model_zoo/common/get_model.py:86-91).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _walk(tree: Dict[str, Any], prefix: str = ""):
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            yield from _walk(v, key)
        else:
            yield key, v


def param_count(tree) -> int:
    return sum(int(np.prod(np.shape(v))) for _, v in _walk(tree))


def param_sum(tree) -> float:
    """Checksum of all parameters (reference get_model.py:89-91 logs this
    to fingerprint loaded weights)."""
    return float(sum(np.asarray(v, np.float64).sum()
                     for _, v in _walk(tree)))


def print_param_summary(tree: Dict[str, Any], name: str = "model",
                        max_rows: int = 24, print_fn=print) -> int:
    """Print a per-subtree table; returns the total parameter count."""
    groups: Dict[str, int] = {}
    for key, v in _walk(tree):
        top = ".".join(key.split(".")[:2])
        groups[top] = groups.get(top, 0) + int(np.prod(np.shape(v)))
    total = sum(groups.values())
    width = max([len(k) for k in groups] + [len(name)]) + 2
    print_fn(f"{name:<{width}} {'params':>12}")
    print_fn("-" * (width + 13))
    for k in sorted(groups)[:max_rows]:
        print_fn(f"{k:<{width}} {groups[k]:>12,}")
    if len(groups) > max_rows:
        print_fn(f"... ({len(groups) - max_rows} more subtrees)")
    print_fn("-" * (width + 13))
    print_fn(f"{'total':<{width}} {total:>12,}")
    return total
