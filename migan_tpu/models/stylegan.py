"""StyleGAN2 building blocks — functional JAX, NHWC.

Re-implements the capability of the reference StyleGAN2 library
(reference: lib/model_zoo/stylegan.py): equalized-lr dense, modulated conv,
synthesis/torgb layers, the 8-layer mapping network with w_avg EMA +
truncation, synthesis/discriminator blocks, and full G/D.

TPU-first design notes:
  - `modulated_conv2d` uses the scale-activations formulation (multiply x by
    per-sample styles, one shared-weight conv, multiply by demod coeffs)
    instead of the reference's reshape-batch-into-groups fused path
    (reference stylegan.py:184-195). On TPU a batched grouped conv with
    feature_group_count == batch wastes the MXU; per-sample scales fuse into
    the conv prologue/epilogue for free, and the demod coefficients reduce to
    one [N,I]x[I,O] matmul: dcoef[n,o] = rsqrt(sum_i s[n,i]^2 * W2[i,o] + eps)
    with W2[i,o] = sum_khkw w^2. Numerically identical (convolution is
    linear in both x and w).
  - fp16 pre-normalization (reference stylegan.py:134-138) is applied for
    sub-f32 compute dtypes (bf16 on TPU).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import setup_filter, conv2d_resample, upsample2d, get_unit
from .migan import (
    dense_init, dense_apply, minibatch_std, KeySeq, Params,
)


# ---------------------------------------------------------------------------
# Modulated convolution (reference stylegan.py:102-195)
# ---------------------------------------------------------------------------

def modulated_conv2d(
    x: jnp.ndarray,            # [N, H, W, I]
    weight: jnp.ndarray,       # [kh, kw, I, O]
    styles: jnp.ndarray,       # [N, I]
    noise: Optional[jnp.ndarray] = None,
    up: int = 1,
    down: int = 1,
    padding: int = 0,
    resample_filter=None,
    demodulate: bool = True,
    flip_weight: bool = True,
) -> jnp.ndarray:
    kh, kw, in_channels, out_channels = weight.shape

    # Pre-normalize to avoid overflow in sub-f32 compute
    # (reference stylegan.py:134-138, gated on fp16 there / bf16 here).
    if x.dtype == jnp.bfloat16 and demodulate:
        w_norm = jnp.max(jnp.abs(weight), axis=(0, 1, 2), keepdims=True)
        weight = weight * (1.0 / math.sqrt(in_channels * kh * kw) / w_norm)
        styles = styles / jnp.max(jnp.abs(styles), axis=1, keepdims=True)

    if demodulate:
        # StyleGAN3-style pre-normalization (reference stylegan.py:145-147).
        weight = weight * jax.lax.rsqrt(
            jnp.mean(jnp.square(weight), axis=(0, 1, 2), keepdims=True))
        styles = styles * jax.lax.rsqrt(jnp.mean(jnp.square(styles)))

    dcoefs = None
    if demodulate:
        # dcoef[n,o] = rsqrt(sum_{k,i} (w*s)^2 + eps): one [N,I]x[I,O] matmul.
        w2 = jnp.sum(jnp.square(weight), axis=(0, 1))         # [I, O]
        dcoefs = jax.lax.rsqrt(
            jnp.square(styles) @ w2 + 1e-8)                   # [N, O]

    x = x * styles.astype(x.dtype)[:, None, None, :]
    x = conv2d_resample(x, weight.astype(x.dtype), f=resample_filter, up=up,
                        down=down, padding=padding, flip_weight=flip_weight)
    if dcoefs is not None:
        x = x * dcoefs.astype(x.dtype)[:, None, None, :]
    if noise is not None:
        x = x + noise.astype(x.dtype)
    return x


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------

def conv2d_layer_init(key, in_channels, out_channels, kernel_size,
                      bias=True) -> Params:
    """reference stylegan.py:198-227 (equalized lr: randn init, runtime
    weight_gain = 1/sqrt(fan_in))."""
    p: Params = {"weight": jax.random.normal(
        key, (kernel_size, kernel_size, in_channels, out_channels),
        jnp.float32)}
    if bias:
        p["bias"] = jnp.zeros((out_channels,), jnp.float32)
    return p


def conv2d_layer_apply(p: Params, x, *, act=None, up=1, down=1,
                       resample_filter=None, gain: float = 1.0):
    kh, kw, ic, oc = p["weight"].shape
    weight_gain = 1.0 / math.sqrt(ic * kh * kw)
    w = p["weight"] * weight_gain
    x = conv2d_resample(x, w.astype(x.dtype), f=resample_filter, up=up,
                        down=down, padding=kh // 2, flip_weight=(up == 1))
    if "bias" in p:
        x = x + p["bias"].astype(x.dtype)
    if act is not None:
        x = act(x, gain=gain)
    else:
        x = x * gain
    return x


def synthesis_layer_init(key, in_channels, out_channels, kernel_size, w_dim,
                         resolution, use_noise=True) -> Params:
    """reference stylegan.py:247-278."""
    kw_, ka, kn = jax.random.split(key, 3)
    p = conv2d_layer_init(kw_, in_channels, out_channels, kernel_size,
                          bias=True)
    p["affine"] = dense_init(ka, w_dim, in_channels, bias=True, bias_init=1.0)
    if use_noise:
        p["noise_const"] = jax.random.normal(kn, (resolution, resolution),
                                             jnp.float32)
        p["noise_strength"] = jnp.zeros((), jnp.float32)
    return p


def synthesis_layer_apply(p: Params, x, w, *, act, up=1,
                          resample_filter=None, gain: float = 1.0,
                          noise_mode="random",
                          keyseq: Optional[KeySeq] = None):
    """reference stylegan.py:280-310. NOTE: the conv weight is passed raw
    (no weight_gain) — demodulation wipes the scale (stylegan.py:294-299)."""
    styles = dense_apply(p["affine"], w)
    noise = None
    if "noise_const" in p and noise_mode == "random":
        out_h = x.shape[1] * up
        out_w = x.shape[2] * up
        noise = (jax.random.normal(keyseq(), (x.shape[0], out_h, out_w, 1),
                                   x.dtype) * p["noise_strength"])
    elif "noise_const" in p and noise_mode == "const":
        nc = p["noise_const"]
        noise = (nc * p["noise_strength"])[None, :, :, None]
    x = modulated_conv2d(
        x, p["weight"], styles, noise=noise, up=up,
        padding=p["weight"].shape[0] // 2, resample_filter=resample_filter,
        flip_weight=(up == 1))
    if "bias" in p:
        x = x + p["bias"].astype(x.dtype)
    return act(x, gain=gain) if act is not None else x * gain


def torgb_layer_init(key, in_channels, out_channels, kernel_size,
                     w_dim) -> Params:
    kw_, ka = jax.random.split(key)
    p = conv2d_layer_init(kw_, in_channels, out_channels, kernel_size,
                          bias=True)
    p["affine"] = dense_init(ka, w_dim, in_channels, bias=True, bias_init=1.0)
    return p


def torgb_layer_apply(p: Params, x, w):
    """reference stylegan.py:313-344: styles scaled by weight_gain,
    no demodulation."""
    kh, kw_, ic, oc = p["weight"].shape
    weight_gain = 1.0 / math.sqrt(ic * kh * kw_)
    styles = dense_apply(p["affine"], w) * weight_gain
    x = modulated_conv2d(x, p["weight"], styles, demodulate=False)
    if "bias" in p:
        x = x + p["bias"].astype(x.dtype)
    return x


# ---------------------------------------------------------------------------
# Mapping network (reference stylegan.py:355-439)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class MappingConfig:
    z_dim: int = 512
    c_dim: int = 0
    w_dim: int = 512
    num_ws: Optional[int] = 14
    num_layers: int = 8
    activation: str = "lrelu_agc(alpha=0.2, gain=sqrt_2, clamp=256)"
    lr_multiplier: float = 0.01
    w_avg_beta: Optional[float] = 0.995


def normalize_2nd_moment(x, axis=-1, eps=1e-8):
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis,
                                      keepdims=True) + eps)


def mapping_init(key, cfg: MappingConfig) -> Params:
    feats = ([cfg.z_dim] + [cfg.w_dim] * (cfg.num_layers - 1) + [cfg.w_dim])
    p: Params = {}
    keys = jax.random.split(key, cfg.num_layers)
    for i in range(cfg.num_layers):
        p[f"fc{i}"] = dense_init(keys[i], feats[i], feats[i + 1],
                                 lr_multi=cfg.lr_multiplier)
    if cfg.num_ws is not None and cfg.w_avg_beta is not None:
        p["w_avg"] = jnp.zeros((cfg.w_dim,), jnp.float32)
    return p


def mapping_apply(p: Params, z, cfg: MappingConfig, *, truncation_psi=1.0,
                  truncation_cutoff=None, update_w_avg=False):
    """Returns ws [N, num_ws, w_dim] (and new w_avg if update_w_avg)."""
    act = get_unit(cfg.activation)
    x = normalize_2nd_moment(z.astype(jnp.float32))
    for i in range(cfg.num_layers):
        x = dense_apply(p[f"fc{i}"], x, act=act, lr_multi=cfg.lr_multiplier)

    new_w_avg = None
    if update_w_avg and cfg.w_avg_beta is not None:
        mean_w = jax.lax.stop_gradient(jnp.mean(x, axis=0))
        new_w_avg = mean_w + cfg.w_avg_beta * (p["w_avg"] - mean_w)

    if cfg.num_ws is not None:
        x = jnp.tile(x[:, None, :], (1, cfg.num_ws, 1))
    if truncation_psi != 1:
        w_avg = p["w_avg"]
        if cfg.num_ws is None or truncation_cutoff is None:
            x = w_avg + truncation_psi * (x - w_avg)
        else:
            head = w_avg + truncation_psi * (x[:, :truncation_cutoff] - w_avg)
            x = jnp.concatenate([head, x[:, truncation_cutoff:]], axis=1)
    if update_w_avg:
        return x, new_w_avg
    return x


# ---------------------------------------------------------------------------
# StyleGAN2 synthesis / discriminator blocks (reference stylegan.py:446-856)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class StyleGANConfig:
    w_dim: int = 512
    resolution: int = 256
    rgb_n: int = 3
    ch_base: int = 16384
    ch_max: int = 512
    ic_n: int = 3   # discriminator input channels
    resample_filter: Tuple[int, ...] = (1, 3, 3, 1)
    activation: str = "lrelu_agc(alpha=0.2, gain=sqrt_2, clamp=256)"
    mbstd_group_size: int = 4
    mbstd_c_n: int = 1

    @property
    def log2res(self):
        l = int(math.log2(self.resolution))
        if 2 ** l != self.resolution:
            raise ValueError(self.resolution)
        return l

    @property
    def block_res(self):
        return [2 ** i for i in range(2, self.log2res + 1)]

    @property
    def encode_res(self):
        return [2 ** i for i in range(self.log2res, 1, -1)]

    def ch(self, res):
        return min(self.ch_base // res, self.ch_max)

    @property
    def act(self):
        return get_unit(self.activation)

    @property
    def filt(self):
        return setup_filter(list(self.resample_filter))

    @property
    def num_ws(self):
        # 2 convs per up-block + 1 for b4 const conv + 1 torgb of last block
        return 1 + 2 * (len(self.block_res) - 1) + 1


def synthesis_init(key, cfg: StyleGANConfig) -> Params:
    params: Params = {}
    keys = jax.random.split(key, len(cfg.block_res))
    for i, res in enumerate(cfg.block_res):
        oc = cfg.ch(res)
        k0, k1, k2, k3 = jax.random.split(keys[i], 4)
        block: Params = {}
        if res == 4:
            block["const"] = jax.random.normal(k0, (res, res, oc),
                                               jnp.float32)
        else:
            ic = cfg.ch(res // 2)
            block["conv0"] = synthesis_layer_init(k0, ic, oc, 3, cfg.w_dim,
                                                  res)
        block["conv1"] = synthesis_layer_init(k1, oc, oc, 3, cfg.w_dim, res)
        block["torgb"] = torgb_layer_init(k2, oc, cfg.rgb_n, 1, cfg.w_dim)
        params[f"b{res}"] = block
    return params


def synthesis_apply(params: Params, ws, cfg: StyleGANConfig, *,
                    noise_mode="random", rng=None):
    """reference stylegan.py:576-589 (skip-architecture generator)."""
    act = cfg.act
    keyseq = KeySeq(rng) if noise_mode == "random" else None
    x = img = None
    w_idx = 0
    for res in cfg.block_res:
        p = params[f"b{res}"]
        if "const" in p:
            x = jnp.tile(p["const"][None], (ws.shape[0], 1, 1, 1))
        else:
            x = synthesis_layer_apply(p["conv0"], x, ws[:, w_idx], act=act,
                                      up=2, resample_filter=cfg.filt,
                                      noise_mode=noise_mode, keyseq=keyseq)
            w_idx += 1
        x = synthesis_layer_apply(p["conv1"], x, ws[:, w_idx], act=act,
                                  noise_mode=noise_mode, keyseq=keyseq)
        w_idx += 1
        if img is not None:
            img = upsample2d(img, cfg.filt)
        y = torgb_layer_apply(p["torgb"], x, ws[:, w_idx])
        img = img + y if img is not None else y
    return img


def generator_init(key, map_cfg: MappingConfig, cfg: StyleGANConfig) -> Params:
    km, ks = jax.random.split(key)
    return {"mapping": mapping_init(km, map_cfg),
            "synthesis": synthesis_init(ks, cfg)}


def generator_apply(params: Params, z, map_cfg: MappingConfig,
                    cfg: StyleGANConfig, *, truncation_psi=1.0,
                    truncation_cutoff=None, noise_mode="random", rng=None):
    ws = mapping_apply(params["mapping"], z, map_cfg,
                       truncation_psi=truncation_psi,
                       truncation_cutoff=truncation_cutoff)
    return synthesis_apply(params["synthesis"], ws, cfg,
                           noise_mode=noise_mode, rng=rng)


def discrim_block_init(key, ic_n, mc_n, oc_n, rgb_n=None,
                       reslink=True) -> Params:
    k0, k1, k2, k3 = jax.random.split(key, 4)
    block: Params = {
        "conv0": conv2d_layer_init(k1, ic_n, mc_n, 3),
        "conv1": conv2d_layer_init(k2, mc_n, oc_n, 3),
    }
    if rgb_n is not None:
        block["fromrgb"] = conv2d_layer_init(k0, rgb_n, mc_n, 1)
    if reslink:
        block["skip"] = conv2d_layer_init(k3, mc_n, oc_n, 1, bias=False)
    return block


def discrim_block_apply(p: Params, x, img, cfg: StyleGANConfig,
                        return_feat=False):
    """reference stylegan.py:672-698 / comodgan.py:35-61 (feat variant)."""
    act = cfg.act
    if "fromrgb" in p:
        y = conv2d_layer_apply(p["fromrgb"], img, act=act)
        x = x + y if x is not None else y
    if "skip" in p:
        y = conv2d_layer_apply(p["skip"], x, act=None, down=2,
                               resample_filter=cfg.filt,
                               gain=math.sqrt(0.5))
        feat = conv2d_layer_apply(p["conv0"], x, act=act)
        x = conv2d_layer_apply(p["conv1"], feat, act=act, down=2,
                               resample_filter=cfg.filt,
                               gain=math.sqrt(0.5))
        x = y + x
    else:
        feat = conv2d_layer_apply(p["conv0"], x, act=act)
        x = conv2d_layer_apply(p["conv1"], feat, act=act, down=2,
                               resample_filter=cfg.filt)
    if return_feat:
        return x, feat
    return x


def discrim_epilogue_init(key, ic_n, cfg: StyleGANConfig, resolution=4,
                          out_n=1) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv": conv2d_layer_init(k1, ic_n + cfg.mbstd_c_n, ic_n, 3),
        "fc": dense_init(k2, ic_n * resolution ** 2, ic_n),
        "out": dense_init(k3, ic_n, out_n),
    }


def discrim_epilogue_apply(p: Params, x, cfg: StyleGANConfig):
    """reference stylegan.py:760-772."""
    act = cfg.act
    if cfg.mbstd_c_n > 0:
        x = minibatch_std(x, cfg.mbstd_group_size, cfg.mbstd_c_n)
    x = conv2d_layer_apply(p["conv"], x, act=act)
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
    x = dense_apply(p["fc"], x, act=act)
    return dense_apply(p["out"], x)


def discriminator_init(key, cfg: StyleGANConfig) -> Params:
    params: Params = {}
    res_list = cfg.encode_res
    keys = jax.random.split(key, len(res_list))
    for idx, (resi, resj) in enumerate(zip(res_list[:-1], res_list[1:])):
        ci, cj = cfg.ch(resi), cfg.ch(resj)
        params[f"b{resi}"] = discrim_block_init(
            keys[idx], ci, ci, cj, rgb_n=cfg.ic_n if idx == 0 else None,
            reslink=True)
    c4 = cfg.ch(res_list[-1])
    params["b4"] = discrim_epilogue_init(keys[-1], c4, cfg)
    return params


def discriminator_apply(params: Params, img, cfg: StyleGANConfig):
    x = None
    for resi in cfg.encode_res[:-1]:
        x = discrim_block_apply(params[f"b{resi}"], x, img, cfg)
        img = None
    return discrim_epilogue_apply(params["b4"], x, cfg)
