"""Batch-folded fast inference path for the MI-GAN generator.

At 512 resolution the top-stage activations have only 64 channels — half a
TPU lane register — and measurements show the XLA sepconv at C=64 is
*slower* than at C=128 (25.9ms vs 22.1ms for the same logical work: the
lane padding wastes half the bandwidth). This module folds PAIRS of batch
images into the channel dimension for the top-resolution stage:

    [N, H, W, C] -> [N/2, H, W, 2C]

which is mathematically EXACT for every op in the stage:
  - depthwise 3x3 / FIR resamplers: per-channel -> tile the weights;
  - pointwise 1x1 / fromrgb / torgb: block-diagonal weights
    (2x MXU flops — free at ~5% MXU utilization);
  - bias/activation/noise: broadcast per pixel -> unchanged.

Measured: 2.21x on the top-stage sepconv, the dominant cost of migan-512
inference. Lower stages already have >=128 channels and are untouched.
The standard path (migan_inference.generator_apply) remains the numerics
oracle; parity is tested to bf16 tolerance.
"""

from __future__ import annotations

from typing import Any, Dict


import jax.numpy as jnp

from ..ops import conv2d, upsample2d, downsample2d
from .migan_inference import (
    GeneratorConfig, ACT, resample_filter, _noise_for,
    sep_conv_apply, encoder_block_apply, _conv1x1_apply,
)

Params = Dict[str, Any]


def fold(x: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W, C] -> [N/2, H, W, 2C] (pairs of images into channels)."""
    n, h, w, c = x.shape
    assert n % 2 == 0
    return x.reshape(n // 2, 2, h, w, c).transpose(0, 2, 3, 1, 4).reshape(
        n // 2, h, w, 2 * c)


def unfold(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`fold`."""
    m, h, w, c2 = x.shape
    c = c2 // 2
    return x.reshape(m, h, w, 2, c).transpose(0, 3, 1, 2, 4).reshape(
        2 * m, h, w, c)


def _tile_dw(w: jnp.ndarray) -> jnp.ndarray:
    """depthwise [k,k,1,C] -> [k,k,1,2C]."""
    return jnp.tile(w, (1, 1, 1, 2))


def _blockdiag_pw(w: jnp.ndarray) -> jnp.ndarray:
    """pointwise [1,1,I,O] -> block-diag [1,1,2I,2O]."""
    _, _, i, o = w.shape
    z = jnp.zeros((1, 1, i, o), w.dtype)
    top = jnp.concatenate([w, z], axis=3)
    bot = jnp.concatenate([z, w], axis=3)
    return jnp.concatenate([top, bot], axis=2)


def fold_stage_params(params: Params) -> Params:
    """Transform one encoder/synthesis block's params to folded form."""
    def conv(p):
        out = {"weight": (_tile_dw(p["weight"]) if p["weight"].shape[2] == 1
                          else _blockdiag_pw(p["weight"]))}
        if "bias" in p:
            out["bias"] = jnp.tile(p["bias"], (2,))
        return out

    def sep(p):
        out = {"conv1": conv(p["conv1"]), "conv2": conv(p["conv2"])}
        for k in ("noise_const", "noise_strength"):
            if k in p:
                out[k] = p[k]
        return out

    out: Params = {}
    for name, blk in params.items():
        if name in ("conv1", "conv2"):
            out[name] = sep(blk)
        elif name in ("fromrgb", "torgb"):
            out[name] = conv(blk)
    return out


def _sep_folded(p: Params, x, f, *, down=1, up=1, use_noise=False):
    """Folded SeparableConv2d (same structure as
    migan_inference.sep_conv_apply; weights already folded)."""
    c2 = x.shape[-1]
    k = p["conv1"]["weight"].shape[0]
    # NOTE: the fused Pallas sepconv (ops/pallas/sepconv.py) wins 1.65x in
    # isolation at these shapes but LOSES in-model (409 vs 450 img/s): the
    # XLA path fuses the surrounding skip-adds/resamplers into its convs,
    # and the pallas call is a fusion barrier. Revisit by folding the
    # neighbours into the kernel itself; until then the XLA path is faster.
    x = conv2d(x, p["conv1"]["weight"], padding=k // 2, groups=c2)
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


def generator_apply_fast(params: Params, x: jnp.ndarray,
                         cfg: GeneratorConfig) -> jnp.ndarray:
    """Forward with the top stage batch-folded. Falls back to the standard
    path when folding doesn't apply (top-stage channels >= 128 or odd N)."""
    from .migan_inference import generator_apply

    top_res = cfg.encode_res[0]
    c_top = cfg.ch(top_res)
    if c_top >= 128 or x.shape[0] % 2 != 0 or x.shape[0] < 2:
        return generator_apply(params, x, cfg)

    f = resample_filter()
    enc = params["encoder"]
    syn = params["synthesis"]
    p_et = fold_stage_params(enc[f"b{top_res}"])     # folded encoder top
    p_st = fold_stage_params(syn[f"b{top_res}"])     # folded synthesis top

    # ---- encoder top stage (folded) ----------------------------------
    xf = fold(x)
    y = conv2d(xf, p_et["fromrgb"]["weight"])
    y = ACT(y + p_et["fromrgb"]["bias"].astype(y.dtype))
    feat_f = _sep_folded(p_et["conv1"], y, f)
    z = _sep_folded(p_et["conv2"], feat_f, f, down=2)
    z = unfold(z)

    # ---- remaining encoder stages (standard) --------------------------
    feats: Dict[int, jnp.ndarray] = {}
    for resi in cfg.encode_res[1:-1]:
        z, feat = encoder_block_apply(enc[f"b{resi}"], z, None, f, down=2)
        feats[resi] = feat
    z, feat = encoder_block_apply(enc["b4"], z, None, f, down=1)
    feats[4] = feat

    # ---- synthesis through the second-to-top stage (standard) ---------
    p4 = syn["b4"]
    zz = sep_conv_apply(p4["conv1"], z, f)
    zz = zz + feats[4]
    zz = sep_conv_apply(p4["conv2"], zz, f)
    img = _conv1x1_apply(p4["torgb"], zz)
    for res in cfg.block_res[1:-1]:
        p = syn[f"b{res}"]
        zz = sep_conv_apply(p["conv1"], zz, f, up=2, use_noise=True)
        zz = zz + feats[res]
        zz = sep_conv_apply(p["conv2"], zz, f, use_noise=True)
        img = upsample2d(img, f)
        img = img + _conv1x1_apply(p["torgb"], zz)

    # ---- synthesis top stage (folded) ----------------------------------
    p_top = syn[f"b{top_res}"]
    # conv1: dw+pw at the lower res (lane-full, standard), then fold for
    # the expensive upsample/noise/act at top res
    c_in = zz.shape[-1]
    k = p_top["conv1"]["conv1"]["weight"].shape[0]
    t = conv2d(zz, p_top["conv1"]["conv1"]["weight"], padding=k // 2,
               groups=c_in)
    t = ACT(t + p_top["conv1"]["conv1"]["bias"].astype(t.dtype))
    t = conv2d(t, p_top["conv1"]["conv2"]["weight"])
    t = fold(t)
    t = upsample2d(t, f, up=2)
    n = _noise_for(p_top["conv1"], t.shape[1], t.shape[2])
    t = ACT(t + n[None, :, :, None].astype(t.dtype))

    # NOTE on pallas here: fused_block (ops/pallas/sepconv.py) wins 1.58x in
    # isolation at exactly these shapes, but each XLA<->pallas boundary
    # costs ~2 relayout passes (measured: solo 7.7 vs 12.2 ms, in-chain
    # 20.8 vs 18.4 ms) — a single fused call in the middle of the stage
    # nets a LOSS. Round-2 plan: run the whole stage as consecutive pallas
    # calls so only the stage entry/exit pay the relayout.
    t = t + feat_f
    t = _sep_folded(p_st["conv2"], t, f, use_noise=True)

    img_f = fold(img)
    img_f = upsample2d(img_f, f)
    y = conv2d(t, p_st["torgb"]["weight"])
    y = y + p_st["torgb"]["bias"].astype(y.dtype)
    return unfold(img_f + y)
