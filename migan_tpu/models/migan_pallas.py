"""Whole-stage Pallas inference path for the MI-GAN generator.

Builds on the batch-folded path (models/migan_fold.py) and replaces the two
top-resolution stages — the dominant cost of migan-512 inference, measured
HBM-bandwidth-bound — with chained Pallas kernels that keep activations in
the flat / w-packed 2-D layout end to end, so XLA<->Mosaic relayout is paid
only at stage entry/exit (the round-1 lesson: a single fused call in the
middle of an XLA conv chain loses to relayout costs; a whole stage wins):

  encoder top   : fromrgb as a flat MXU matmul -> fused_block
                  (dw+act+pw+act, ops/pallas/sepconv.py) -> fused_down_block
                  (dw+act+FIR-down+pw+act, ops/pallas/downblock.py)
  synthesis top : conv1's low-res half in XLA -> fused_up_block
                  (FIR-up+noise+act+skip+dw+act+pw+noise+act,
                  ops/pallas/upblock.py) -> torgb as a flat matmul

Numerics: identical op semantics to models/migan_inference.py (the oracle);
parity is tested in tests/test_migan_pallas.py. Reference semantics:
lib/model_zoo/migan_inference.py:106-200 (SeparableConv2d / encoder blocks)
and :332-352 (synthesis skips + RGB accumulation).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from ..ops import conv2d, upsample2d
from ..ops.pallas.sepconv import fused_block
from ..ops.pallas.upblock import fused_up_block
from ..ops.pallas.downblock import fused_down_block
from .migan_inference import (
    GeneratorConfig, ACT, resample_filter, _noise_for,
    sep_conv_apply, encoder_block_apply, _conv1x1_apply,
)
from .migan_fold import fold, unfold, fold_stage_params

Params = Dict[str, Any]


def _flat_pw(x: jnp.ndarray, w: jnp.ndarray, b=None) -> jnp.ndarray:
    """Pointwise conv as a flat [N*H*W, C] MXU matmul — layout-neutral, so
    it chains with the Pallas kernels without conv relayouts."""
    n, h, wd, c = x.shape
    if w.ndim == 4:
        w = w[0, 0]
    y = x.reshape(n * h * wd, c) @ w.astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.reshape(n, h, wd, w.shape[-1])


def pallas_stage_eligible(cfg: GeneratorConfig, n: int) -> bool:
    """The folded top stage runs the Pallas chain when the folded channel
    counts fill TPU lanes (the same condition under which folding applies)."""
    top_res = cfg.encode_res[0]
    c_top = cfg.ch(top_res)
    return (c_top < 128 and (2 * c_top) % 128 == 0 and n % 2 == 0 and n >= 2
            and top_res // 2 % 8 == 0)


def generator_apply_pallas(params: Params, x: jnp.ndarray,
                           cfg: GeneratorConfig,
                           interpret: bool = False) -> jnp.ndarray:
    """Forward with Pallas-fused, batch-folded top stages. Falls back to
    the standard path when the geometry doesn't apply."""
    from .migan_inference import generator_apply

    if not pallas_stage_eligible(cfg, x.shape[0]):
        return generator_apply(params, x, cfg)

    top_res = cfg.encode_res[0]
    f = resample_filter()
    enc = params["encoder"]
    syn = params["synthesis"]
    p_et = fold_stage_params(enc[f"b{top_res}"])
    p_st = fold_stage_params(syn[f"b{top_res}"])

    # ---- encoder top stage: Pallas chain ------------------------------
    xf = fold(x)
    y = ACT(_flat_pw(xf, p_et["fromrgb"]["weight"], p_et["fromrgb"]["bias"]))
    feat_f = fused_block(
        y, p_et["conv1"]["conv1"]["weight"], p_et["conv1"]["conv1"]["bias"],
        p_et["conv1"]["conv2"]["weight"], interpret=interpret)
    z = fused_down_block(
        feat_f, p_et["conv2"]["conv1"]["weight"],
        p_et["conv2"]["conv1"]["bias"], p_et["conv2"]["conv2"]["weight"],
        interpret=interpret)
    z = unfold(z)

    # ---- remaining encoder stages (standard XLA) -----------------------
    feats: Dict[int, jnp.ndarray] = {}
    for resi in cfg.encode_res[1:-1]:
        z, feat = encoder_block_apply(enc[f"b{resi}"], z, None, f, down=2)
        feats[resi] = feat
    z, feat = encoder_block_apply(enc["b4"], z, None, f, down=1)
    feats[4] = feat

    # ---- synthesis through the second-to-top stage (standard) ----------
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

    # ---- synthesis top stage: Pallas chain -----------------------------
    p_top = syn[f"b{top_res}"]
    # conv1 low-res half (dw at half res, unfolded; pw -> c_top), XLA
    c_in = zz.shape[-1]
    k = p_top["conv1"]["conv1"]["weight"].shape[0]
    t = conv2d(zz, p_top["conv1"]["conv1"]["weight"], padding=k // 2,
               groups=c_in)
    t = ACT(t + p_top["conv1"]["conv1"]["bias"].astype(t.dtype))
    t = conv2d(t, p_top["conv1"]["conv2"]["weight"])
    x_lo = fold(t)
    # conv1 hi-res half + skip + conv2, one kernel
    n1 = _noise_for(p_top["conv1"], top_res, top_res)
    n2 = _noise_for(p_top["conv2"], top_res, top_res)
    t = fused_up_block(
        x_lo, feat_f, n1,
        p_st["conv2"]["conv1"]["weight"], p_st["conv2"]["conv1"]["bias"],
        p_st["conv2"]["conv2"]["weight"], n2, interpret=interpret)

    # torgb as a flat matmul; img branch (6 folded channels) in XLA
    img_f = fold(img)
    img_f = upsample2d(img_f, f)
    y = _flat_pw(t, p_st["torgb"]["weight"], p_st["torgb"]["bias"])
    return unfold(img_f + y)
