"""MI-GAN deployment generator — functional JAX, NHWC, fully convolutional.

Re-implements the capability of the reference deployment net
(reference: lib/model_zoo/migan_inference.py:355-369): an encoder/decoder of
SeparableConv2d blocks with [1,3,3,1] FIR resampling, lrelu(0.2)*sqrt(2)
clamp-256 activations, per-resolution skip connections and an accumulated RGB
output.

TPU-first design differences from the reference:
  - NHWC activations, HWIO weights; params are a plain pytree (dict).
  - Resampling is `ops.upfirdn2d` (one lax conv w/ lhs_dilation) rather than
    the fixed `filter_const` buffer trick (reference migan_inference.py:83-101)
    -> the network is *fully convolutional*: any H, W divisible by
    2**(levels-2) works, not just the trained resolution (the improvement
    called out in reference README.md:87).
  - `noise_const` buffers are kept for weight-import parity but are sliced /
    tiled to the runtime spatial size, so they no longer pin the resolution.

Input:  x [N, H, W, 4] = concat([mask - 0.5, rgb * mask], channel-last),
        rgb in [-1, 1], mask 1=known 0=hole.
Output: [N, H, W, 3] RGB in [-1, 1].
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import (
    setup_filter, upsample2d, downsample2d, conv2d, lrelu_agc,
)

# The model's single activation (reference migan_inference.py:179).
ACT = lrelu_agc(alpha=0.2, gain="sqrt_2", clamp=256)

# Shared normalized 4-tap resampling filter (reference uses [1,3,3,1] with
# gain baked into the convenience wrappers).
_FILTER_TAPS = (1, 3, 3, 1)


def resample_filter():
    return setup_filter(list(_FILTER_TAPS))


@dataclass(frozen=True)
class GeneratorConfig:
    """Static architecture config (defines depth and channel schedule)."""

    resolution: int = 256       # trained resolution; sets block count/channels
    ic_n: int = 4               # input channels (mask + rgb)
    rgb_n: int = 3
    ch_base: int = 32768
    ch_max: int = 512

    @property
    def log2res(self) -> int:
        l = int(math.log2(self.resolution))
        if 2 ** l != self.resolution:
            raise ValueError(f"resolution {self.resolution} not a power of 2")
        return l

    @property
    def encode_res(self):
        """[res, res/2, ..., 4] (reference migan_inference.py:217)."""
        return [2 ** i for i in range(self.log2res, 1, -1)]

    @property
    def block_res(self):
        """[4, 8, ..., res] for synthesis (reference migan_inference.py:332)."""
        return [2 ** i for i in range(2, self.log2res + 1)]

    def ch(self, res: int) -> int:
        return min(self.ch_base // res, self.ch_max)


Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initialization (torch nn.Conv2d-style statistics: kaiming_uniform(a=sqrt 5),
# bias ~ U(±1/sqrt(fan_in)) — so random-init behaviour matches the reference).
# ---------------------------------------------------------------------------

def _conv_init(key, kh, kw, ic, oc, bias=True) -> Params:
    wkey, bkey = jax.random.split(key)
    fan_in = ic * kh * kw
    bound = math.sqrt(6.0 / ((1 + 5) * fan_in))  # kaiming_uniform a=sqrt(5)
    p = {"weight": jax.random.uniform(wkey, (kh, kw, ic, oc), jnp.float32,
                                      -bound, bound)}
    if bias:
        b = 1.0 / math.sqrt(fan_in)
        p["bias"] = jax.random.uniform(bkey, (oc,), jnp.float32, -b, b)
    return p


def _sep_conv_init(key, ic, oc, k=3, bias=True, use_noise=False,
                   resolution=None) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "conv1": _conv_init(k1, k, k, 1, ic, bias=bias),  # depthwise: I=1,O=ic
        "conv2": _conv_init(k2, 1, 1, ic, oc, bias=False),
    }
    if use_noise:
        assert resolution is not None
        p["noise_const"] = jax.random.normal(k3, (resolution, resolution),
                                             jnp.float32)
        p["noise_strength"] = jnp.zeros((), jnp.float32)
    return p


# ---------------------------------------------------------------------------
# Forward blocks
# ---------------------------------------------------------------------------

def _noise_for(p: Params, h: int, w: int) -> jnp.ndarray:
    """noise_const adapted to the runtime spatial size.

    Matching size -> trained buffer verbatim; smaller -> top-left crop;
    larger -> tiled. Keeps determinism and import parity while removing the
    fixed-resolution restriction (reference README.md:87).
    """
    nc = p["noise_const"]
    nh, nw = nc.shape
    if (h, w) != (nh, nw):
        reps = (max(1, -(-h // nh)), max(1, -(-w // nw)))
        nc = jnp.tile(nc, reps)[:h, :w]
    return nc * p["noise_strength"]


def sep_conv_apply(p: Params, x: jnp.ndarray, f, *, down: int = 1,
                   up: int = 1, use_noise: bool = False) -> jnp.ndarray:
    """SeparableConv2d (reference migan_inference.py:106-170):
    depthwise kxk (+bias) -> act -> [down] -> pointwise 1x1 -> [up]
    -> [+noise] -> act."""
    ic = x.shape[-1]
    k = p["conv1"]["weight"].shape[0]
    # NOTE: the fused Pallas sepconv only pays off at large spatial sizes
    # with 128-lane-aligned channels (measured 1.65x at [*,512,512,128] but
    # a net LOSS when applied broadly — it breaks XLA's fusion of the
    # surrounding adds/resamplers into the convs). It is applied selectively
    # on the batch-folded path (models/migan_fold.py).
    x = conv2d(x, p["conv1"]["weight"], padding=k // 2, groups=ic)
    if "bias" in p["conv1"]:
        x = x + p["conv1"]["bias"].astype(x.dtype)
    x = ACT(x)
    if down > 1:
        x = downsample2d(x, f, down=down)
    x = conv2d(x, p["conv2"]["weight"])
    if up > 1:
        x = upsample2d(x, f, up=up)
    if use_noise:
        n = _noise_for(p, x.shape[1], x.shape[2])
        x = x + n[None, :, :, None].astype(x.dtype)
    return ACT(x)


def _conv1x1_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    x = conv2d(x, p["weight"])
    if "bias" in p:
        x = x + p["bias"].astype(x.dtype)
    return x


def encoder_block_apply(p: Params, x: Optional[jnp.ndarray],
                        img: jnp.ndarray, f, *, down: int):
    """Reference migan_inference.py:173-200."""
    if "fromrgb" in p:
        y = ACT(_conv1x1_apply(p["fromrgb"], img))
        x = x + y if x is not None else y
    feat = sep_conv_apply(p["conv1"], x, f)
    x = sep_conv_apply(p["conv2"], feat, f, down=down)
    return x, feat


def encoder_init(key, cfg: GeneratorConfig) -> Params:
    params: Params = {}
    res_list = cfg.encode_res
    keys = jax.random.split(key, len(res_list))
    for idx, (resi, resj) in enumerate(zip(res_list[:-1], res_list[1:])):
        ci, cj = cfg.ch(resi), cfg.ch(resj)
        k0, k1, k2 = jax.random.split(keys[idx], 3)
        block: Params = {
            "conv1": _sep_conv_init(k1, ci, ci),
            "conv2": _sep_conv_init(k2, ci, cj),
        }
        if idx == 0:
            block["fromrgb"] = _conv_init(k0, 1, 1, cfg.ic_n, ci)
        params[f"b{resi}"] = block
    c4 = cfg.ch(res_list[-1])
    k1, k2 = jax.random.split(keys[-1])
    params["b4"] = {
        "conv1": _sep_conv_init(k1, c4, c4),
        "conv2": _sep_conv_init(k2, c4, c4),
    }
    return params


def encoder_apply(params: Params, cfg: GeneratorConfig, img: jnp.ndarray, f):
    """Reference migan_inference.py:235-246. Returns bottleneck + skip feats
    keyed by *block level* (trained resolution), robust to other input sizes."""
    x = None
    feats: Dict[int, jnp.ndarray] = {}
    for resi in cfg.encode_res[:-1]:
        x, feat = encoder_block_apply(params[f"b{resi}"], x, img, f, down=2)
        feats[resi] = feat
    x, feat = encoder_block_apply(params["b4"], x, img, f, down=1)
    feats[4] = feat
    return x, feats


def synthesis_init(key, cfg: GeneratorConfig) -> Params:
    params: Params = {}
    res_list = cfg.block_res
    keys = jax.random.split(key, len(res_list))
    c4 = cfg.ch(4)
    k1, k2, k3 = jax.random.split(keys[0], 3)
    params["b4"] = {
        "conv1": _sep_conv_init(k1, c4, c4),
        "conv2": _sep_conv_init(k2, c4, c4),
        "torgb": _conv_init(k3, 1, 1, c4, cfg.rgb_n),
    }
    for i, (resi, resj) in enumerate(zip(res_list[:-1], res_list[1:])):
        ci, cj = cfg.ch(resi), cfg.ch(resj)
        k1, k2, k3 = jax.random.split(keys[i + 1], 3)
        params[f"b{resj}"] = {
            "conv1": _sep_conv_init(k1, ci, cj, use_noise=True,
                                    resolution=resj),
            "conv2": _sep_conv_init(k2, cj, cj, use_noise=True,
                                    resolution=resj),
            "torgb": _conv_init(k3, 1, 1, cj, cfg.rgb_n),
        }
    return params


def synthesis_apply(params: Params, cfg: GeneratorConfig, x: jnp.ndarray,
                    feats: Dict[int, jnp.ndarray], f) -> jnp.ndarray:
    """Reference migan_inference.py:347-352."""
    p4 = params["b4"]
    x = sep_conv_apply(p4["conv1"], x, f)
    x = x + feats[4]
    x = sep_conv_apply(p4["conv2"], x, f)
    img = _conv1x1_apply(p4["torgb"], x)

    for res in cfg.block_res[1:]:
        p = params[f"b{res}"]
        x = sep_conv_apply(p["conv1"], x, f, up=2, use_noise=True)
        x = x + feats[res]
        x = sep_conv_apply(p["conv2"], x, f, use_noise=True)
        img = upsample2d(img, f)
        img = img + _conv1x1_apply(p["torgb"], x)
    return img


def generator_init(key, cfg: GeneratorConfig = GeneratorConfig()) -> Params:
    ke, ks = jax.random.split(key)
    return {
        "encoder": encoder_init(ke, cfg),
        "synthesis": synthesis_init(ks, cfg),
    }


def generator_apply(params: Params, x: jnp.ndarray,
                    cfg: GeneratorConfig = GeneratorConfig()) -> jnp.ndarray:
    """Full forward (reference migan_inference.py:362-369). Jittable; H and W
    may be any multiple of 2**(log2(cfg.resolution) - 2)."""
    f = resample_filter()
    z, feats = encoder_apply(params["encoder"], cfg, x, f)
    return synthesis_apply(params["synthesis"], cfg, z, feats, f)


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
