"""InceptionV3 feature extractor (pytorch_fid "FID flavor") — JAX, NHWC.

Re-implements the detector used by the reference's standalone FID evaluation
(reference: scripts/evaluate_fid_lpips.py:216-218, pytorch_fid's InceptionV3
wrapper at pool3/2048 dims) so FID can be computed on-device, batched, at
TPU speed. BatchNorm is folded into per-channel scale/bias at import
(inference-only detector).

FID-flavor deviations from stock torchvision InceptionV3 (pytorch_fid
inception.py): the avg-pool branches of InceptionA/C/E_1 use
count_include_pad=False, and InceptionE_2 (Mixed_7c) uses a 3x3 max-pool
branch instead of avg-pool.

Weights: import a torchvision-style state_dict via
:func:`import_inception_state_dict` (the published pt_inception-2015-12-05
weights or torchvision's inception_v3). Random init is provided for
smoke/structure tests — FID numbers are only meaningful with real weights.

Input contract (matching pytorch_fid defaults): NHWC float in [0, 1];
resized to 299x299 bilinear (align_corners=False ≡ jax.image.resize) and
scaled to [-1, 1] internally. Output: [N, 2048] pool features.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = Dict[str, Any]

# (name, out_channels, (kh, kw), (sh, sw), (ph, pw))
_STEM = [
    ("Conv2d_1a_3x3", 32, (3, 3), (2, 2), (0, 0)),
    ("Conv2d_2a_3x3", 32, (3, 3), (1, 1), (0, 0)),
    ("Conv2d_2b_3x3", 64, (3, 3), (1, 1), (1, 1)),
    ("maxpool1", None, None, None, None),
    ("Conv2d_3b_1x1", 80, (1, 1), (1, 1), (0, 0)),
    ("Conv2d_4a_3x3", 192, (3, 3), (1, 1), (0, 0)),
    ("maxpool2", None, None, None, None),
]

_MIXED = [
    ("Mixed_5b", "A", 192, 32),
    ("Mixed_5c", "A", 256, 64),
    ("Mixed_5d", "A", 288, 64),
    ("Mixed_6a", "B", 288, None),
    ("Mixed_6b", "C", 768, 128),
    ("Mixed_6c", "C", 768, 160),
    ("Mixed_6d", "C", 768, 160),
    ("Mixed_6e", "C", 768, 192),
    ("Mixed_7a", "D", 768, None),
    ("Mixed_7b", "E1", 1280, None),
    ("Mixed_7c", "E2", 2048, None),
]


def _conv(x, p, stride=(1, 1), padding=(0, 0)):
    """Folded conv+BN+ReLU unit."""
    if isinstance(padding, tuple) and isinstance(padding[0], int):
        padding = ((padding[0], padding[0]), (padding[1], padding[1]))
    x = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)
    return jnp.maximum(x, 0.0)


def _maxpool3(x, stride=2, pad=0):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, stride, stride, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)))


def _avgpool3_nopad(x):
    """3x3 stride-1 pad-1 average pooling with count_include_pad=False."""
    s = lax.reduce_window(x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                          ((0, 0), (1, 1), (1, 1), (0, 0)))
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    cnt = lax.reduce_window(ones, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                            ((0, 0), (1, 1), (1, 1), (0, 0)))
    return s / cnt


def _branch(x, params, names_strides):
    for name, stride, padding in names_strides:
        x = _conv(x, params[name], stride=stride, padding=padding)
    return x


def _inception_a(x, p):
    b1 = _conv(x, p["branch1x1"])
    b5 = _conv(x, p["branch5x5_1"])
    b5 = _conv(b5, p["branch5x5_2"], padding=(2, 2))
    b3 = _conv(x, p["branch3x3dbl_1"])
    b3 = _conv(b3, p["branch3x3dbl_2"], padding=(1, 1))
    b3 = _conv(b3, p["branch3x3dbl_3"], padding=(1, 1))
    bp = _avgpool3_nopad(x)
    bp = _conv(bp, p["branch_pool"])
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(x, p):
    b3 = _conv(x, p["branch3x3"], stride=(2, 2))
    bd = _conv(x, p["branch3x3dbl_1"])
    bd = _conv(bd, p["branch3x3dbl_2"], padding=(1, 1))
    bd = _conv(bd, p["branch3x3dbl_3"], stride=(2, 2))
    bp = _maxpool3(x, stride=2)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(x, p):
    b1 = _conv(x, p["branch1x1"])
    b7 = _conv(x, p["branch7x7_1"])
    b7 = _conv(b7, p["branch7x7_2"], padding=(0, 3))
    b7 = _conv(b7, p["branch7x7_3"], padding=(3, 0))
    bd = _conv(x, p["branch7x7dbl_1"])
    bd = _conv(bd, p["branch7x7dbl_2"], padding=(3, 0))
    bd = _conv(bd, p["branch7x7dbl_3"], padding=(0, 3))
    bd = _conv(bd, p["branch7x7dbl_4"], padding=(3, 0))
    bd = _conv(bd, p["branch7x7dbl_5"], padding=(0, 3))
    bp = _avgpool3_nopad(x)
    bp = _conv(bp, p["branch_pool"])
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(x, p):
    b3 = _conv(x, p["branch3x3_1"])
    b3 = _conv(b3, p["branch3x3_2"], stride=(2, 2))
    b7 = _conv(x, p["branch7x7x3_1"])
    b7 = _conv(b7, p["branch7x7x3_2"], padding=(0, 3))
    b7 = _conv(b7, p["branch7x7x3_3"], padding=(3, 0))
    b7 = _conv(b7, p["branch7x7x3_4"], stride=(2, 2))
    bp = _maxpool3(x, stride=2)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(x, p, pool: str):
    b1 = _conv(x, p["branch1x1"])
    b3 = _conv(x, p["branch3x3_1"])
    b3 = jnp.concatenate([
        _conv(b3, p["branch3x3_2a"], padding=(0, 1)),
        _conv(b3, p["branch3x3_2b"], padding=(1, 0)),
    ], axis=-1)
    bd = _conv(x, p["branch3x3dbl_1"])
    bd = _conv(bd, p["branch3x3dbl_2"], padding=(1, 1))
    bd = jnp.concatenate([
        _conv(bd, p["branch3x3dbl_3a"], padding=(0, 1)),
        _conv(bd, p["branch3x3dbl_3b"], padding=(1, 0)),
    ], axis=-1)
    if pool == "max":   # FIDInceptionE_2 (Mixed_7c)
        bp = _maxpool3(x, stride=1, pad=1)
    else:               # FIDInceptionE_1: count_include_pad=False avg
        bp = _avgpool3_nopad(x)
    bp = _conv(bp, p["branch_pool"])
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_apply(params: Params, x: jnp.ndarray, *,
                    resize_input: bool = True,
                    normalize_input: bool = True,
                    compute_dtype=None) -> jnp.ndarray:
    """x: NHWC float in [0,1] -> [N, 2048] pool features.

    compute_dtype='bfloat16' runs the conv stack in bf16 (weights cast
    per-layer, output pooled in f32) — faster scoring on TPU; shifts
    FID slightly (tests/test_evalx.py::test_detector_bf16_tolerance
    bounds it), so f32 stays the default for metric fidelity."""
    if resize_input:
        x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[3]),
                             method="bilinear")
    if normalize_input:
        x = 2.0 * x - 1.0
    if compute_dtype is not None:
        x = x.astype(compute_dtype)

    x = _conv(x, params["Conv2d_1a_3x3"], stride=(2, 2))
    x = _conv(x, params["Conv2d_2a_3x3"])
    x = _conv(x, params["Conv2d_2b_3x3"], padding=(1, 1))
    x = _maxpool3(x)
    x = _conv(x, params["Conv2d_3b_1x1"])
    x = _conv(x, params["Conv2d_4a_3x3"])
    x = _maxpool3(x)
    for name, kind, _, _ in _MIXED:
        p = params[name]
        if kind == "A":
            x = _inception_a(x, p)
        elif kind == "B":
            x = _inception_b(x, p)
        elif kind == "C":
            x = _inception_c(x, p)
        elif kind == "D":
            x = _inception_d(x, p)
        elif kind == "E1":
            x = _inception_e(x, p, pool="avg")
        else:
            x = _inception_e(x, p, pool="max")
    # adaptive avg pool -> [N, 2048]; accumulate in f32 under bf16 compute
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2))


# ---------------------------------------------------------------------------
# Weight import / random init
# ---------------------------------------------------------------------------

_BN_EPS = 1e-3


def import_inception_state_dict(sd: Mapping[str, np.ndarray]) -> Params:
    """torchvision-style InceptionV3 state_dict -> folded params.

    Accepts keys like 'Mixed_5b.branch1x1.conv.weight',
    '...bn.{weight,bias,running_mean,running_var}'. fc / AuxLogits are
    ignored (FID uses pool features)."""
    units: Dict[str, Dict[str, np.ndarray]] = {}
    for key, val in sd.items():
        if key.startswith(("fc.", "AuxLogits.")) or "num_batches" in key:
            continue
        parts = key.split(".")
        unit = ".".join(parts[:-2])   # e.g. Mixed_5b.branch1x1
        field = ".".join(parts[-2:])  # conv.weight / bn.weight / ...
        units.setdefault(unit, {})[field] = np.asarray(val)

    params: Params = {}
    for unit, f in units.items():
        w = np.transpose(f["conv.weight"], (2, 3, 1, 0))  # OIHW -> HWIO
        gamma, beta = f["bn.weight"], f["bn.bias"]
        mean, var = f["bn.running_mean"], f["bn.running_var"]
        scale = gamma / np.sqrt(var + _BN_EPS)
        bias = beta - mean * scale
        node = params
        parts = unit.split(".")
        for p_ in parts[:-1]:
            node = node.setdefault(p_, {})
        node[parts[-1]] = {
            "w": jnp.asarray(w),
            "scale": jnp.asarray(scale.astype(np.float32)),
            "bias": jnp.asarray(bias.astype(np.float32)),
        }
    return params


def _unit_init(key, kh, kw, ic, oc):
    w = jax.random.normal(key, (kh, kw, ic, oc), jnp.float32)
    w = w / math.sqrt(ic * kh * kw)
    return {"w": w, "scale": jnp.ones((oc,)), "bias": jnp.zeros((oc,))}


def inception_init(key) -> Params:
    """Random-weight InceptionV3 (structure tests / smoke only)."""
    params: Params = {}
    kiter = iter(jax.random.split(key, 128))

    ic = 3
    for name, oc, k, s, p in _STEM:
        if oc is None:
            continue
        params[name] = _unit_init(next(kiter), k[0], k[1], ic, oc)
        ic = oc

    def unit(ic_, oc_, kh=1, kw=1):
        return _unit_init(next(kiter), kh, kw, ic_, oc_)

    for name, kind, ic_n, pf in _MIXED:
        p: Params = {}
        if kind == "A":
            p["branch1x1"] = unit(ic_n, 64)
            p["branch5x5_1"] = unit(ic_n, 48)
            p["branch5x5_2"] = unit(48, 64, 5, 5)
            p["branch3x3dbl_1"] = unit(ic_n, 64)
            p["branch3x3dbl_2"] = unit(64, 96, 3, 3)
            p["branch3x3dbl_3"] = unit(96, 96, 3, 3)
            p["branch_pool"] = unit(ic_n, pf)
        elif kind == "B":
            p["branch3x3"] = unit(ic_n, 384, 3, 3)
            p["branch3x3dbl_1"] = unit(ic_n, 64)
            p["branch3x3dbl_2"] = unit(64, 96, 3, 3)
            p["branch3x3dbl_3"] = unit(96, 96, 3, 3)
        elif kind == "C":
            c7 = pf
            p["branch1x1"] = unit(ic_n, 192)
            p["branch7x7_1"] = unit(ic_n, c7)
            p["branch7x7_2"] = unit(c7, c7, 1, 7)
            p["branch7x7_3"] = unit(c7, 192, 7, 1)
            p["branch7x7dbl_1"] = unit(ic_n, c7)
            p["branch7x7dbl_2"] = unit(c7, c7, 7, 1)
            p["branch7x7dbl_3"] = unit(c7, c7, 1, 7)
            p["branch7x7dbl_4"] = unit(c7, c7, 7, 1)
            p["branch7x7dbl_5"] = unit(c7, 192, 1, 7)
            p["branch_pool"] = unit(ic_n, 192)
        elif kind == "D":
            p["branch3x3_1"] = unit(ic_n, 192)
            p["branch3x3_2"] = unit(192, 320, 3, 3)
            p["branch7x7x3_1"] = unit(ic_n, 192)
            p["branch7x7x3_2"] = unit(192, 192, 1, 7)
            p["branch7x7x3_3"] = unit(192, 192, 7, 1)
            p["branch7x7x3_4"] = unit(192, 192, 3, 3)
        else:  # E1 / E2
            p["branch1x1"] = unit(ic_n, 320)
            p["branch3x3_1"] = unit(ic_n, 384)
            p["branch3x3_2a"] = unit(384, 384, 1, 3)
            p["branch3x3_2b"] = unit(384, 384, 3, 1)
            p["branch3x3dbl_1"] = unit(ic_n, 448)
            p["branch3x3dbl_2"] = unit(448, 384, 3, 3)
            p["branch3x3dbl_3a"] = unit(384, 384, 1, 3)
            p["branch3x3dbl_3b"] = unit(384, 384, 3, 1)
            p["branch_pool"] = unit(ic_n, 192)
        params[name] = p
    return params
