"""Lightweight native checkpoint format: flat .npz of '/'-joined pytree paths.

Used for standalone weights (the analog of the reference's plain state_dict
.pt files, reference: lib/model_zoo/common/get_model.py:24-29). Full training
state (params, EMA, optimizer moments, step) uses orbax in train/checkpoint.py
— strictly more than the reference checkpoints, which drop optimizer state
(SURVEY.md §5.4).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax.numpy as jnp


def _flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def save_npz(path: str, params: Dict[str, Any]) -> None:
    np.savez(path, **_flatten(params))


def load_npz(path: str) -> Dict[str, Any]:
    with np.load(path) as data:
        return _unflatten({k: data[k] for k in data.files})
