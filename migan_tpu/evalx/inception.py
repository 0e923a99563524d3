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


def tf_resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """TF1 legacy ``tf.image.resize_bilinear(align_corners=False)``:
    src = dst * (in/out), NO half-pixel offset, border-clamped — the
    resize baked into the NVIDIA TorchScript Inception via its
    affine_grid/grid_sample trick (theta[·,2] += 1/in - 1/299 under
    align_corners=False reduces to exactly src = dst*scale).
    Separable gather+lerp, NHWC."""
    def axis_weights(in_size, out_size):
        src = jnp.arange(out_size, dtype=jnp.float32) * (in_size / out_size)
        i0 = jnp.floor(src).astype(jnp.int32)
        frac = src - i0
        i0 = jnp.clip(i0, 0, in_size - 1)
        i1 = jnp.clip(i0 + 1, 0, in_size - 1)
        return i0, i1, frac

    n, h, w, c = x.shape
    if h != out_h:
        i0, i1, f = axis_weights(h, out_h)
        f = f[None, :, None, None]
        x = jnp.take(x, i0, axis=1) * (1 - f) + jnp.take(x, i1, axis=1) * f
    if w != out_w:
        j0, j1, f = axis_weights(w, out_w)
        f = f[None, None, :, None]
        x = jnp.take(x, j0, axis=2) * (1 - f) + jnp.take(x, j1, axis=2) * f
    return x


def inception_apply(params: Params, x: jnp.ndarray, *,
                    resize_input: bool = True,
                    normalize_input: bool = True,
                    compute_dtype=None) -> jnp.ndarray:
    """x: NHWC float in [0,1] -> [N, 2048] pool features.

    compute_dtype='bfloat16' runs the conv stack AND the input resize in
    bf16 (weights cast per-layer, output pooled in f32) — faster scoring
    on TPU; shifts FID slightly (tests/test_evalx.py::
    test_detector_bf16_tolerance bounds it end-to-end, resize included),
    so f32 stays the default for metric fidelity."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    if resize_input:
        x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[3]),
                             method="bilinear")
    if normalize_input:
        x = 2.0 * x - 1.0
    return _backbone(params, x)


def inception_apply_nvidia(params: Params, x: jnp.ndarray, *,
                           compute_dtype=None) -> jnp.ndarray:
    """The reference's TRAINING-TIME FID detector contract (SURVEY §3.3
    second flavor; reference frechet_inception_distance.py:25-26 loads the
    NVIDIA TorchScript translation of the TF inception-2015-12-05 graph,
    metric_utils.py:40-51 feeds it raw uint8):

      x: NHWC float/uint8 in [0, 255]  ->  [N, 2048] pool features

    Preprocessing matches the TorchScript forward: TF-legacy bilinear
    resize to 299 (NOT half-pixel; see tf_resize_bilinear) then
    (x - 128) / 128. The backbone is the SAME graph as the pytorch_fid
    flavor (pytorch_fid's FIDInception* classes are themselves a port of
    this TF graph), so the two flavors share `_backbone` and differ only
    in preprocessing + weight naming (import_inception_tf_names)."""
    x = x.astype(jnp.float32)
    x = tf_resize_bilinear(x, 299, 299)
    x = (x - 128.0) / 128.0
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    return _backbone(params, x)


def _backbone(params: Params, x: jnp.ndarray) -> jnp.ndarray:
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


# TF-graph unit name -> (our tree path, expected (kh, kw)). The NVIDIA
# TorchScript detector is a direct translation of the TF
# inception-2015-12-05 GraphDef and keeps its tower naming; this table is
# the correspondence to the torchvision-style names used by _backbone.
# Kernel shapes are asserted at import so a wrong orientation in this
# table fails loudly on real weights instead of silently transposing.
_TF_STEM = {
    "conv": ("Conv2d_1a_3x3", (3, 3)),
    "conv_1": ("Conv2d_2a_3x3", (3, 3)),
    "conv_2": ("Conv2d_2b_3x3", (3, 3)),
    "conv_3": ("Conv2d_3b_1x1", (1, 1)),
    "conv_4": ("Conv2d_4a_3x3", (3, 3)),
}

_TF_MIXED_NAMES = {
    "mixed": "Mixed_5b", "mixed_1": "Mixed_5c", "mixed_2": "Mixed_5d",
    "mixed_3": "Mixed_6a", "mixed_4": "Mixed_6b", "mixed_5": "Mixed_6c",
    "mixed_6": "Mixed_6d", "mixed_7": "Mixed_6e", "mixed_8": "Mixed_7a",
    "mixed_9": "Mixed_7b", "mixed_10": "Mixed_7c",
}

_TF_BRANCHES = {
    "A": {
        "conv": ("branch1x1", (1, 1)),
        "tower.conv": ("branch5x5_1", (1, 1)),
        "tower.conv_1": ("branch5x5_2", (5, 5)),
        "tower_1.conv": ("branch3x3dbl_1", (1, 1)),
        "tower_1.conv_1": ("branch3x3dbl_2", (3, 3)),
        "tower_1.conv_2": ("branch3x3dbl_3", (3, 3)),
        "tower_2.conv": ("branch_pool", (1, 1)),
    },
    "B": {
        "conv": ("branch3x3", (3, 3)),
        "tower.conv": ("branch3x3dbl_1", (1, 1)),
        "tower.conv_1": ("branch3x3dbl_2", (3, 3)),
        "tower.conv_2": ("branch3x3dbl_3", (3, 3)),
    },
    "C": {
        "conv": ("branch1x1", (1, 1)),
        "tower.conv": ("branch7x7_1", (1, 1)),
        "tower.conv_1": ("branch7x7_2", (1, 7)),
        "tower.conv_2": ("branch7x7_3", (7, 1)),
        "tower_1.conv": ("branch7x7dbl_1", (1, 1)),
        "tower_1.conv_1": ("branch7x7dbl_2", (7, 1)),
        "tower_1.conv_2": ("branch7x7dbl_3", (1, 7)),
        "tower_1.conv_3": ("branch7x7dbl_4", (7, 1)),
        "tower_1.conv_4": ("branch7x7dbl_5", (1, 7)),
        "tower_2.conv": ("branch_pool", (1, 1)),
    },
    "D": {
        "tower.conv": ("branch3x3_1", (1, 1)),
        "tower.conv_1": ("branch3x3_2", (3, 3)),
        "tower_1.conv": ("branch7x7x3_1", (1, 1)),
        "tower_1.conv_1": ("branch7x7x3_2", (1, 7)),
        "tower_1.conv_2": ("branch7x7x3_3", (7, 1)),
        "tower_1.conv_3": ("branch7x7x3_4", (3, 3)),
    },
    "E": {
        "conv": ("branch1x1", (1, 1)),
        "tower.conv": ("branch3x3_1", (1, 1)),
        "tower.mixed.conv": ("branch3x3_2a", (1, 3)),
        "tower.mixed.conv_1": ("branch3x3_2b", (3, 1)),
        "tower_1.conv": ("branch3x3dbl_1", (1, 1)),
        "tower_1.conv_1": ("branch3x3dbl_2", (3, 3)),
        "tower_1.mixed.conv": ("branch3x3dbl_3a", (1, 3)),
        "tower_1.mixed.conv_1": ("branch3x3dbl_3b", (3, 1)),
        "tower_2.conv": ("branch_pool", (1, 1)),
    },
}

_TF_BLOCK_KIND = {
    "mixed": "A", "mixed_1": "A", "mixed_2": "A", "mixed_3": "B",
    "mixed_4": "C", "mixed_5": "C", "mixed_6": "C", "mixed_7": "C",
    "mixed_8": "D", "mixed_9": "E", "mixed_10": "E",
}


def import_inception_tf_names(sd: Mapping[str, np.ndarray]) -> Params:
    """NVIDIA-TorchScript / TF-named state_dict -> folded params for
    `_backbone` (the training-time FID flavor,
    reference frechet_inception_distance.py:25-26).

    Accepts keys like 'layers.mixed_4.tower.conv_1.conv.weight' and
    '...{bn,batchnorm}.{weight,bias,running_mean,running_var}' ('layers.'
    prefix optional, as is the BN scale — the TF 2015 graph's batchnorm
    has beta only). The classifier head ('output.*') is ignored: FID uses
    pool3 features (detector_kwargs return_features=True,
    reference frechet_inception_distance.py:27-29)."""
    units: Dict[str, Dict[str, np.ndarray]] = {}
    for key, val in sd.items():
        k = key[7:] if key.startswith("layers.") else key
        if k.startswith("output.") or "num_batches" in k:
            continue
        parts = k.split(".")
        leaf = parts[-1]
        mod = parts[-2]
        if mod in ("bn", "batchnorm"):
            field = "bn." + leaf
        elif leaf == "weight" and np.ndim(val) == 4:
            field = "conv.weight"  # '<unit>.conv.weight'
        else:
            raise ValueError(f"unrecognized detector key layout: {key!r}")
        unit = ".".join(parts[:-2])
        units.setdefault(unit, {})[field] = np.asarray(val)

    def fold(f, want_khkw, where):
        w = f["conv.weight"]
        assert tuple(w.shape[2:]) == want_khkw, \
            f"{where}: kernel {w.shape} != expected {want_khkw}"
        w = np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO
        oc = w.shape[-1]
        gamma = f.get("bn.weight", np.ones((oc,), np.float32))
        beta = f["bn.bias"]
        mean, var = f["bn.running_mean"], f["bn.running_var"]
        scale = gamma / np.sqrt(var + _BN_EPS)
        bias = beta - mean * scale
        return {"w": jnp.asarray(w),
                "scale": jnp.asarray(scale.astype(np.float32)),
                "bias": jnp.asarray(bias.astype(np.float32))}

    params: Params = {}
    for tf_name, (ours, khkw) in _TF_STEM.items():
        params[ours] = fold(units.pop(tf_name), khkw, tf_name)
    for tf_block, kind in _TF_BLOCK_KIND.items():
        ours_block = _TF_MIXED_NAMES[tf_block]
        out: Params = {}
        for tf_sub, (ours, khkw) in _TF_BRANCHES[kind].items():
            unit = f"{tf_block}.{tf_sub}"
            out[ours] = fold(units.pop(unit), khkw, unit)
        params[ours_block] = out
    if units:
        raise ValueError(f"unmapped detector units: {sorted(units)[:8]}")
    return params


def import_inception_torchscript(path: str) -> Params:
    """Load the NVIDIA TorchScript detector file
    (inception-2015-12-05.pt, reference metric_utils.py:40-51 cache) and
    import its weights. torch.jit.load never executes the scripted
    forward here — only state_dict() is read."""
    return import_inception_tf_names(_torchscript_state_dict(path))


def _torchscript_state_dict(path: str) -> Dict[str, np.ndarray]:
    """state_dict of a TorchScript archive as numpy (never executes the
    scripted forward — only weights are read)."""
    import torch

    mod = torch.jit.load(path, map_location="cpu")
    return {k: v.detach().cpu().numpy() for k, v in mod.state_dict().items()}


def load_inception_weights(path: str, flavor: str = "auto"):
    """Load detector weights from disk, auto-detecting which FID flavor the
    file holds (SURVEY §3.3: the reference uses TWO detectors that give
    different FID numbers — pytorch_fid's torchvision-named InceptionV3 for
    standalone eval, NVIDIA's TF-named TorchScript for training-time
    metrics, reference frechet_inception_distance.py:25-26).

    Returns (params, flavor) with flavor in {"pytorch_fid", "nvidia_tf"}.
    Detection: TorchScript archives and TF-named state_dicts
    ('[layers.]mixed_4.tower...') -> nvidia_tf; torchvision names
    ('Mixed_5b.branch1x1...') -> pytorch_fid."""
    from ..io.torch_import import load_torch_state_dict

    try:
        sd = load_torch_state_dict(path)
    except Exception:
        sd = _torchscript_state_dict(path)
    keys = list(sd)
    has_torchvision = any(k.startswith(("Mixed_", "Conv2d_")) for k in keys)
    has_tf = any(
        (k[7:] if k.startswith("layers.") else k).startswith(
            ("mixed", "conv"))
        for k in keys if not k.startswith("output."))
    if has_torchvision == has_tf:
        raise ValueError(
            f"cannot detect detector layout of {path} (keys like "
            f"{keys[:3]})")
    detected = "nvidia_tf" if has_tf else "pytorch_fid"
    if flavor == "auto":
        flavor = detected
    elif flavor != detected:
        raise ValueError(f"requested flavor {flavor!r} but {path} holds a "
                         f"{detected!r}-layout state_dict")
    if flavor == "nvidia_tf":
        return import_inception_tf_names(sd), flavor
    return import_inception_state_dict(sd), flavor


def make_detector(params: Params, flavor: str = "pytorch_fid", *,
                  compute_dtype=None, jit: bool = True):
    """Build a detector fn matching the metrics-stack contract
    (evalx.metrics: NHWC float in [0,1] -> [N, 2048] features) for either
    FID flavor.

    nvidia_tf quantizes to the uint8 grid first — the reference converts
    composites to uint8 before feeding the TorchScript detector
    (metric_utils.py:40-51; (img*127.5+128).clamp.to(uint8) on [-1,1] is
    round-half-up of x01*255) — so numbers match reference training logs."""
    if flavor == "pytorch_fid":
        fn = lambda x: inception_apply(params, x, compute_dtype=compute_dtype)
    elif flavor == "nvidia_tf":
        fn = lambda x: inception_apply_nvidia(
            params, jnp.floor(jnp.clip(x, 0.0, 1.0) * 255.0 + 0.5),
            compute_dtype=compute_dtype)
    else:
        raise ValueError(f"unknown detector flavor {flavor!r}")
    return jax.jit(fn) if jit else fn


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
