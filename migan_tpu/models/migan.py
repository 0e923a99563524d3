"""MI-GAN training-time networks — functional JAX, NHWC.

Re-implements the capability of the reference training nets
(reference: lib/model_zoo/migan.py): generator encoder/synthesis and
StyleGAN2-style discriminator built from a single Conv2d primitive that
supports

  - N-tensor re-parameterization: weight = (w0 + ... + wN-1) / sqrt(N)
    (reference migan.py:86-92,108-112). Stored here as ONE stacked array
    [N, kh, kw, I/g, O] so the sum is a single reduction — a pytree-level
    design choice, folded back to per-tensor names on torch import/export.
  - forward-time per-output-channel weight normalization
    w * rsqrt(sum(w^2) + 1e-8) (reference migan.py:115).
  - fused resampling via ops.conv2d_resample (reference migan.py:119-128).
  - optional noise injection (random per-sample or const buffer) + bias +
    activation-with-gain (reference migan.py:130-146).

Synthesis additionally returns per-resolution torgb/img intermediate outputs
consumed by the knowledge-distillation loss (reference migan.py:516-524).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import setup_filter, conv2d_resample, upsample2d, get_unit

Params = Dict[str, Any]


class KeySeq:
    """Deterministic per-layer PRNG key stream for noise injection.

    Host-side counter over fold_in — structure is static under jit, so each
    noise-using layer gets a stable, distinct key per step key.
    """

    def __init__(self, key: Optional[jax.Array]):
        self._key = key
        self._n = 0

    def __call__(self) -> jax.Array:
        assert self._key is not None, "noise_mode='random' requires an rng key"
        k = jax.random.fold_in(self._key, self._n)
        self._n += 1
        return k


@dataclass(frozen=True)
class MiganConfig:
    """Architecture flags (reference configs/model/migan.yaml)."""

    resolution: int = 256
    ic_n: int = 4
    rgb_n: int = 3
    ch_base: int = 32768
    ch_max: int = 512
    resample_filter: Tuple[int, ...] = (1, 3, 3, 1)
    activation: str = "lrelu_agc(alpha=0.2, gain=sqrt_2, clamp=256)"
    depthwise: bool = True
    reparametrize: bool = True
    num_reparam_tensors: int = 9
    # discriminator-only
    mbstd_group_size: int = 4
    mbstd_c_n: int = 1

    @property
    def log2res(self) -> int:
        l = int(math.log2(self.resolution))
        if 2 ** l != self.resolution:
            raise ValueError(self.resolution)
        return l

    @property
    def encode_res(self):
        return [2 ** i for i in range(self.log2res, 1, -1)]

    @property
    def block_res(self):
        return [2 ** i for i in range(2, self.log2res + 1)]

    def ch(self, res: int) -> int:
        return min(self.ch_base // res, self.ch_max)

    @property
    def act(self):
        return get_unit(self.activation)

    @property
    def filt(self):
        return setup_filter(list(self.resample_filter))


# ---------------------------------------------------------------------------
# Core layers
# ---------------------------------------------------------------------------

def dense_init(key, in_features, out_features, bias=True, bias_init=0.0,
               lr_multi=1.0) -> Params:
    """Reference migan.py:14-48 (equalized-lr dense)."""
    p: Params = {
        "weight": jax.random.normal(key, (out_features, in_features),
                                    jnp.float32) / lr_multi,
    }
    if bias:
        p["bias"] = jnp.full((out_features,), float(bias_init), jnp.float32)
    return p


def dense_apply(p: Params, x: jnp.ndarray, act=None, lr_multi=1.0,
                gain: float = 1.0) -> jnp.ndarray:
    in_features = p["weight"].shape[1]
    weight_gain = lr_multi / math.sqrt(in_features)
    w = p["weight"].astype(x.dtype) * weight_gain
    x = x @ w.T
    if "bias" in p:
        b = p["bias"].astype(x.dtype)
        if lr_multi != 1.0:
            b = b * lr_multi
        x = x + b
    if act is not None:
        x = act(x, gain=gain)
    return x


def conv_layer_init(key, in_channels, out_channels, kernel_size, cfg: MiganConfig,
                    bias=True, use_noise=False, resolution=None,
                    groups=1, reparametrize=None) -> Params:
    """Training Conv2d params (reference migan.py:54-103).

    Weights are stored HWIO; re-param tensors stacked on a leading axis.
    """
    reparam = cfg.reparametrize if reparametrize is None else reparametrize
    wkey, nkey = jax.random.split(key)
    shape = (kernel_size, kernel_size, in_channels // groups, out_channels)
    if reparam:
        w = jax.random.normal(wkey, (cfg.num_reparam_tensors,) + shape,
                              jnp.float32)
        p: Params = {"w_stack": w}
    else:
        p = {"weight": jax.random.normal(wkey, shape, jnp.float32)}
    if bias:
        p["bias"] = jnp.zeros((out_channels,), jnp.float32)
    if use_noise:
        assert resolution is not None
        p["noise_const"] = jax.random.normal(nkey, (resolution, resolution),
                                             jnp.float32)
        p["noise_strength"] = jnp.zeros((), jnp.float32)
    return p


def effective_weight(p: Params) -> jnp.ndarray:
    """Re-param sum + weight norm (reference migan.py:108-115)."""
    if "w_stack" in p:
        n = p["w_stack"].shape[0]
        w = jnp.sum(p["w_stack"], axis=0) / math.sqrt(n)
    else:
        w = p["weight"]
    # per-output-channel normalization over (kh, kw, I)
    denom = jax.lax.rsqrt(jnp.sum(jnp.square(w), axis=(0, 1, 2),
                                  keepdims=True) + 1e-8)
    return w * denom


def conv_layer_apply(p: Params, x: jnp.ndarray, cfg: MiganConfig, *,
                     act=None, up=1, down=1, use_filter=False, groups=1,
                     gain: float = 1.0, noise_mode: str = "none",
                     keyseq: Optional[KeySeq] = None) -> jnp.ndarray:
    """Training Conv2d forward (reference migan.py:105-146)."""
    assert noise_mode in ("random", "const", "none")
    w = effective_weight(p)
    k = w.shape[0]
    f = cfg.filt if use_filter else None
    x = conv2d_resample(
        x, w.astype(x.dtype), f=f, up=up, down=down, padding=k // 2,
        groups=groups, flip_weight=(up == 1),
    )

    noise = None
    if "noise_const" in p:
        if noise_mode == "random":
            noise = (jax.random.normal(keyseq(), (x.shape[0], x.shape[1],
                                                  x.shape[2], 1), x.dtype)
                     * p["noise_strength"].astype(x.dtype))
        elif noise_mode == "const":
            nc = p["noise_const"]
            nh, nw = nc.shape
            h, w_ = x.shape[1], x.shape[2]
            if (h, w_) != (nh, nw):
                reps = (max(1, -(-h // nh)), max(1, -(-w_ // nw)))
                nc = jnp.tile(nc, reps)[:h, :w_]
            noise = (nc * p["noise_strength"]).astype(x.dtype)[None, :, :,
                                                               None]
    if noise is not None:
        x = x + noise

    if "bias" in p:
        x = x + p["bias"].astype(x.dtype)
    if act is not None:
        x = act(x, gain=gain)
    else:
        x = x * gain
    return x


def sep_conv_init(key, in_channels, out_channels, cfg: MiganConfig, k=3,
                  bias=True, use_noise=False, resolution=None) -> Params:
    """SeparableConv2d params (reference migan.py:152-200)."""
    k1, k2 = jax.random.split(key)
    return {
        "conv1": conv_layer_init(k1, in_channels, in_channels, k, cfg,
                                 bias=bias, groups=in_channels),
        "conv2": conv_layer_init(k2, in_channels, out_channels, 1, cfg,
                                 bias=False, use_noise=use_noise,
                                 resolution=resolution),
    }


def sep_conv_apply(p: Params, x: jnp.ndarray, cfg: MiganConfig, *, act,
                   up=1, down=1, use_filter=False, gain: float = 1.0,
                   noise_mode="none", keyseq=None) -> jnp.ndarray:
    ic = x.shape[-1]
    x = conv_layer_apply(p["conv1"], x, cfg, act=act, groups=ic, gain=gain,
                         noise_mode="none")
    x = conv_layer_apply(p["conv2"], x, cfg, act=act, up=up, down=down,
                         use_filter=use_filter, gain=gain,
                         noise_mode=noise_mode, keyseq=keyseq)
    return x


def _conv_or_sep_init(key, ic, oc, cfg: MiganConfig, use_noise=False,
                      resolution=None) -> Params:
    if cfg.depthwise:
        return sep_conv_init(key, ic, oc, cfg, use_noise=use_noise,
                             resolution=resolution)
    return conv_layer_init(key, ic, oc, 3, cfg, use_noise=use_noise,
                           resolution=resolution)


def _conv_or_sep_apply(p, x, cfg: MiganConfig, *, act, up=1, down=1,
                       use_filter=False, gain=1.0, noise_mode="none",
                       keyseq=None):
    if cfg.depthwise:
        return sep_conv_apply(p, x, cfg, act=act, up=up, down=down,
                              use_filter=use_filter, gain=gain,
                              noise_mode=noise_mode, keyseq=keyseq)
    return conv_layer_apply(p, x, cfg, act=act, up=up, down=down,
                            use_filter=use_filter, gain=gain,
                            noise_mode=noise_mode, keyseq=keyseq)


# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------

def encoder_init(key, cfg: MiganConfig) -> Params:
    """Reference migan.py:261-318."""
    params: Params = {}
    res_list = cfg.encode_res
    keys = jax.random.split(key, len(res_list))
    for idx, (resi, resj) in enumerate(zip(res_list[:-1], res_list[1:])):
        ci, cj = cfg.ch(resi), cfg.ch(resj)
        k0, k1, k2 = jax.random.split(keys[idx], 3)
        block: Params = {
            "conv1": _conv_or_sep_init(k1, ci, ci, cfg),
            "conv2": _conv_or_sep_init(k2, ci, cj, cfg),
        }
        if idx == 0:
            # NOTE: the encoder's fromrgb is a plain conv — the reference does
            # not thread reparametrize into it (reference migan.py:223-225),
            # unlike the discriminator's fromrgb (migan.py:577-581).
            block["fromrgb"] = conv_layer_init(k0, cfg.ic_n, ci, 1, cfg,
                                               reparametrize=False)
        params[f"b{resi}"] = block
    c4 = cfg.ch(res_list[-1])
    k1, k2 = jax.random.split(keys[-1])
    params["b4"] = {
        "conv1": _conv_or_sep_init(k1, c4, c4, cfg),
        "conv2": _conv_or_sep_init(k2, c4, c4, cfg),
    }
    return params


def encoder_apply(params: Params, cfg: MiganConfig, img: jnp.ndarray):
    """Reference migan.py:320-331."""
    act = cfg.act
    x = None
    feats: Dict[int, jnp.ndarray] = {}
    for idx, resi in enumerate(cfg.encode_res[:-1]):
        p = params[f"b{resi}"]
        if "fromrgb" in p:
            y = conv_layer_apply(p["fromrgb"], img, cfg, act=act)
            x = x + y if x is not None else y
        feat = _conv_or_sep_apply(p["conv1"], x, cfg, act=act)
        x = _conv_or_sep_apply(p["conv2"], feat, cfg, act=act, down=2,
                               use_filter=True)
        feats[resi] = feat
    p = params["b4"]
    feat = _conv_or_sep_apply(p["conv1"], x, cfg, act=act)
    x = _conv_or_sep_apply(p["conv2"], feat, cfg, act=act)
    feats[4] = feat
    return x, feats


def synthesis_init(key, cfg: MiganConfig) -> Params:
    """Reference migan.py:469-514."""
    params: Params = {}
    res_list = cfg.block_res
    keys = jax.random.split(key, len(res_list))
    c4 = cfg.ch(4)
    k1, k2, k3 = jax.random.split(keys[0], 3)
    params["b4"] = {
        "conv1": _conv_or_sep_init(k1, c4, c4, cfg),
        "conv2": _conv_or_sep_init(k2, c4, c4, cfg),
        "torgb": conv_layer_init(k3, c4, cfg.rgb_n, 1, cfg),
    }
    for i, (resi, resj) in enumerate(zip(res_list[:-1], res_list[1:])):
        ci, cj = cfg.ch(resi), cfg.ch(resj)
        k1, k2, k3 = jax.random.split(keys[i + 1], 3)
        params[f"b{resj}"] = {
            "conv1": _conv_or_sep_init(k1, ci, cj, cfg, use_noise=True,
                                       resolution=resj),
            "conv2": _conv_or_sep_init(k2, cj, cj, cfg, use_noise=True,
                                       resolution=resj),
            "torgb": conv_layer_init(k3, cj, cfg.rgb_n, 1, cfg),
        }
    return params


def synthesis_apply(params: Params, cfg: MiganConfig, x: jnp.ndarray,
                    feats: Dict[int, jnp.ndarray], *, noise_mode="random",
                    keyseq: Optional[KeySeq] = None):
    """Reference migan.py:516-524. Returns (img, intermediate_outputs)."""
    act = cfg.act
    p4 = params["b4"]
    x = _conv_or_sep_apply(p4["conv1"], x, cfg, act=act)
    x = x + feats[4]
    x = _conv_or_sep_apply(p4["conv2"], x, cfg, act=act,
                           noise_mode=noise_mode, keyseq=keyseq)
    img = conv_layer_apply(p4["torgb"], x, cfg, act=None)
    inter = {"res_to_rgb": {4: img}, "res_img": {4: img}}

    for res in cfg.block_res[1:]:
        p = params[f"b{res}"]
        x = _conv_or_sep_apply(p["conv1"], x, cfg, act=act, up=2,
                               use_filter=True, noise_mode=noise_mode,
                               keyseq=keyseq)
        x = x + feats[res]
        x = _conv_or_sep_apply(p["conv2"], x, cfg, act=act,
                               noise_mode=noise_mode, keyseq=keyseq)
        img = upsample2d(img, cfg.filt)
        y = conv_layer_apply(p["torgb"], x, cfg, act=None)
        img = img + y
        inter["res_to_rgb"][res] = y
        inter["res_img"][res] = img
    return img, inter


def generator_init(key, cfg: MiganConfig) -> Params:
    ke, ks = jax.random.split(key)
    return {"encoder": encoder_init(ke, cfg),
            "synthesis": synthesis_init(ks, cfg)}


def generator_apply(params: Params, x: jnp.ndarray, cfg: MiganConfig, *,
                    noise_mode: str = "random",
                    rng: Optional[jax.Array] = None,
                    return_intermediate: bool = False):
    """Reference migan.py:546-555. x: [N,H,W,4] NHWC."""
    keyseq = KeySeq(rng) if noise_mode == "random" else None
    z, feats = encoder_apply(params["encoder"], cfg, x)
    img, inter = synthesis_apply(params["synthesis"], cfg, z, feats,
                                 noise_mode=noise_mode, keyseq=keyseq)
    if return_intermediate:
        return img, inter
    return img


# ---------------------------------------------------------------------------
# Discriminator
# ---------------------------------------------------------------------------

def minibatch_std(x: jnp.ndarray, group_size: int, num_channels: int = 1):
    """NHWC minibatch-std layer (reference migan.py:624-644).

    Groups stay intra-batch (and therefore intra-replica under data
    parallelism — matching the reference's per-GPU semantics, SURVEY.md §7).
    """
    N, H, W, C = x.shape
    G = min(group_size, N) if group_size is not None else N
    F = num_channels
    c = C // F
    y = x.reshape(G, N // G, H, W, F, c)
    y = y - jnp.mean(y, axis=0)
    y = jnp.mean(jnp.square(y), axis=0)
    y = jnp.sqrt(y + 1e-8)
    y = jnp.mean(y, axis=(1, 2, 4))          # [n, F]
    y = y.reshape(-1, 1, 1, F)
    y = jnp.tile(y, (G, H, W, 1))
    return jnp.concatenate([x, y.astype(x.dtype)], axis=-1)


def discriminator_init(key, cfg: MiganConfig) -> Params:
    """Reference migan.py:694-756."""
    params: Params = {}
    res_list = cfg.encode_res
    keys = jax.random.split(key, len(res_list) + 1)
    for idx, (resi, resj) in enumerate(zip(res_list[:-1], res_list[1:])):
        ci, cj = cfg.ch(resi), cfg.ch(resj)
        k0, k1, k2, k3 = jax.random.split(keys[idx], 4)
        block: Params = {
            "conv1": _conv_or_sep_init(k1, ci, ci, cfg),
            "conv2": _conv_or_sep_init(k2, ci, cj, cfg),
            "skip": conv_layer_init(k3, ci, cj, 1, cfg, bias=False),
        }
        if idx == 0:
            block["fromrgb"] = conv_layer_init(k0, cfg.ic_n, ci, 1, cfg)
        params[f"b{resi}"] = block
    c4 = cfg.ch(res_list[-1])
    k1, k2, k3 = jax.random.split(keys[-1], 3)
    params["b4"] = {
        "conv": _conv_or_sep_init(k1, c4 + cfg.mbstd_c_n, c4, cfg),
        "fc": dense_init(k2, c4 * 16, c4),
        "out": dense_init(k3, c4, 1),
    }
    return params


def discriminator_apply(params: Params, img: jnp.ndarray,
                        cfg: MiganConfig) -> jnp.ndarray:
    """Reference migan.py:758-764. img: [N,H,W,ic_n] -> logits [N,1]."""
    act = cfg.act
    sqrt_half = math.sqrt(0.5)
    x = None
    for resi in cfg.encode_res[:-1]:
        p = params[f"b{resi}"]
        if "fromrgb" in p:
            y = conv_layer_apply(p["fromrgb"], img, cfg, act=act)
            x = x + y if x is not None else y
        y = conv_layer_apply(p["skip"], x, cfg, act=None, down=2,
                             use_filter=True, gain=sqrt_half)
        x = _conv_or_sep_apply(p["conv1"], x, cfg, act=act)
        x = _conv_or_sep_apply(p["conv2"], x, cfg, act=act, down=2,
                               use_filter=True, gain=sqrt_half)
        x = y + x
    p = params["b4"]
    if cfg.mbstd_c_n > 0:
        x = minibatch_std(x, cfg.mbstd_group_size, cfg.mbstd_c_n)
    x = _conv_or_sep_apply(p["conv"], x, cfg, act=act)
    # NHWC -> flatten in torch NCHW order (C,H,W) for fc parity on import
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
    x = dense_apply(p["fc"], x, act=act)
    return dense_apply(p["out"], x)


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
