"""Checkpoint/resume via orbax — strictly richer than the reference pkls.

The reference pickles whole modules {'G','D','G_ema'} and DROPS optimizer
state (reference lib/experiments/migan_default.py:542-551, SURVEY.md §5.4).
Here the full TrainState pytree (params_G/D/G_ema + Adam moments + step +
nimg) round-trips, so resume is exact. Standalone weights (.npz) can be
extracted for the demo/export CLIs.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from .train_step import TrainState


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save(ckpt_dir: str, step: int, state: TrainState) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:08d}"))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, _to_host(state), force=True)
    return path


def restore(path: str, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.abspath(path),
                             item=_to_host(template))
    return jax.tree_util.tree_map(lambda t, r: jax.numpy.asarray(r),
                                  template, restored)


def extract_field(path: str, field: str = "params_G_ema"):
    """Template-free extraction of one TrainState field from a checkpoint
    directory — no model construction needed (for demo/export: pull the
    EMA weights out of a training snapshot, the analog of reading 'G_ema'
    from a reference pkl). Orbax restores the unregistered pytree as a
    list in TrainState field order."""
    import dataclasses

    import orbax.checkpoint as ocp

    raw = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    names = [f.name for f in dataclasses.fields(TrainState)]
    if field not in names:
        raise ValueError(f"unknown TrainState field {field!r}; have {names}")
    out = raw[names.index(field)]
    if field.startswith("params") and not (
            isinstance(out, dict) and
            ("encoder" in out or "b4" in out)):
        raise RuntimeError(f"checkpoint layout mismatch extracting {field}")
    return out


def latest(ckpt_dir: str) -> Optional[str]:
    """Newest COMMITTED checkpoint. A crash can land mid-save and leave an
    orbax temp dir (step_N.orbax-checkpoint-tmp...); only exact step_<n>
    names count, so resume falls back to the last complete snapshot
    (exercised for real by the kill+resume training demonstration)."""
    import re

    if not os.path.isdir(ckpt_dir):
        return None
    steps = [d for d in os.listdir(ckpt_dir)
             if re.fullmatch(r"step_\d+", d)]
    if not steps:
        return None
    return os.path.join(ckpt_dir, sorted(steps)[-1])
