"""LPIPS perceptual metric (AlexNet backbone) — JAX, NHWC.

Re-implements the capability of the `lpips.LPIPS(net='alex')` metric used by
the reference evaluation (reference: scripts/evaluate_fid_lpips.py:212-214,
lib/evaluator/eva_lpips.py:11-82): frozen AlexNet conv features at 5 taps,
per-channel unit-normalization, squared differences, learned 1x1 linear
heads, spatial mean, sum over taps.

Weights: import the lpips package's full state_dict (torchvision AlexNet
features + lin heads) via :func:`import_lpips_state_dict`. Random init is
for structure tests only.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = Dict[str, Any]

# ImageNet scaling constants hardcoded in the lpips package (ScalingLayer).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet features: (out, kernel, stride, pad), maxpool(3,2) after taps 0,1
_ALEX = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]


def _conv(x, w, b, stride, pad):
    x = lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride),
        ((pad, pad), (pad, pad)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.maximum(x + b.astype(x.dtype), 0.0)


def _maxpool(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                             (1, 2, 2, 1), ((0, 0), (0, 0), (0, 0), (0, 0)))


def _features(params: Params, x: jnp.ndarray):
    """5 relu taps of AlexNet features."""
    taps = []
    for i, (oc, k, s, p) in enumerate(_ALEX):
        x = _conv(x, params[f"conv{i}"]["weight"], params[f"conv{i}"]["bias"],
                  s, p)
        taps.append(x)
        if i in (0, 1):
            x = _maxpool(x)
    return taps


def _unit_normalize(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


def lpips_apply(params: Params, img0: jnp.ndarray, img1: jnp.ndarray, *,
                normalize: bool = True, compute_dtype=None) -> jnp.ndarray:
    """Per-image LPIPS distance [N]. normalize=True: inputs in [0,1]
    (the reference eval passes normalize=True, evaluate_fid_lpips.py:252).

    compute_dtype='bfloat16' runs the AlexNet conv stack in bf16; the
    normalize/diff/head math stays f32 (sum-of-squares is precision-
    sensitive). Bounded by tests/test_evalx.py::test_detector_bf16_tolerance."""
    if normalize:
        img0 = 2 * img0 - 1
        img1 = 2 * img1 - 1
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)
    x0 = (img0 - shift) / scale
    x1 = (img1 - shift) / scale
    if compute_dtype is not None:
        x0 = x0.astype(compute_dtype)
        x1 = x1.astype(compute_dtype)
    taps0 = _features(params, x0)
    taps1 = _features(params, x1)
    total = 0.0
    for i, (t0, t1) in enumerate(zip(taps0, taps1)):
        t0 = t0.astype(jnp.float32)
        t1 = t1.astype(jnp.float32)
        d = jnp.square(_unit_normalize(t0) - _unit_normalize(t1))
        lin = params[f"lin{i}"]["weight"]  # [1, 1, C, 1]
        v = lax.conv_general_dilated(
            d, lin.astype(d.dtype), (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        total = total + jnp.mean(v, axis=(1, 2, 3))
    return total


def import_lpips_state_dict(sd: Mapping[str, np.ndarray]) -> Params:
    """lpips.LPIPS(net='alex').state_dict() -> params.

    Expects keys 'net.slice{1..5}.<idx>.weight/bias' (AlexNet convs, the
    <idx> being the original torchvision features index) and
    'lin{0..4}.model.1.weight' (1x1 heads). Key order is irrelevant — convs
    are collected by their features index and mapped to conv0..4 in index
    order. scaling_layer buffers (hardcoded here) are ignored."""
    convs: Dict[int, Dict[str, np.ndarray]] = {}
    params: Params = {}
    for k, raw in sd.items():
        v = np.asarray(raw)
        if k.startswith("net.slice") and (k.endswith(".weight")
                                          or k.endswith(".bias")):
            idx = int(k.split(".")[2])
            convs.setdefault(idx, {})[k.rsplit(".", 1)[1]] = v
        elif k.startswith("lin") and k.endswith(".weight"):
            i = int(k.split(".", 1)[0][3:])
            params[f"lin{i}"] = {
                "weight": jnp.asarray(np.transpose(v, (2, 3, 1, 0)))}
    assert len(convs) == 5, f"expected 5 alexnet convs, got {sorted(convs)}"
    for conv_i, idx in enumerate(sorted(convs)):
        f = convs[idx]
        params[f"conv{conv_i}"] = {
            "weight": jnp.asarray(np.transpose(f["weight"], (2, 3, 1, 0))),
            "bias": jnp.asarray(f["bias"]),
        }
    for i in range(5):
        assert f"lin{i}" in params, f"missing lin{i} head"
    return params


def lpips_init(key) -> Params:
    """Random weights (structure tests only)."""
    params: Params = {}
    ic = 3
    keys = jax.random.split(key, 10)
    for i, (oc, k, s, p) in enumerate(_ALEX):
        w = jax.random.normal(keys[i], (k, k, ic, oc)) / math.sqrt(ic * k * k)
        params[f"conv{i}"] = {"weight": w, "bias": jnp.zeros((oc,))}
        params[f"lin{i}"] = {
            "weight": jnp.abs(jax.random.normal(keys[5 + i], (1, 1, oc, 1)))
            / oc}
        ic = oc
    return params
