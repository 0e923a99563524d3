"""Whole-stage Pallas inference path for the MI-GAN generator.

Builds on the batch-folded path (models/migan_fold.py) and replaces the two
top-resolution stages — the dominant cost of migan-512 inference, measured
HBM-bandwidth-bound — with chained Pallas kernels. Every tensor between the
kernels lives in ONE 2-D layout, the w-packed view

    [N, H, W, C]  ->  [N*H*(W/2), 2C]   (even/odd w-pixels side by side)

because op-level traces (scripts/profile_fwd.py) show the flat<->packed
reshape is a real ~13 ms HBM round-trip per 512-res tensor at batch 128 —
chaining kernels is only a win if NOTHING between them changes layout:

  encoder top   : fromrgb as a flat MXU matmul (tiny-lane input tensors
                  pack terribly in XLA — packing the 8-ch input measured
                  45 ms) -> fused_block with an IN-KERNEL packed store
                  (ops/pallas/sepconv.py) -> fused_down_block consuming
                  the packed rows directly (ops/pallas/downblock.py)
  mid stage     : second-to-top encoder/synthesis stages run batch-folded
                  in XLA (models/migan_fold._sep_folded) so the 512/256
                  frontier needs no unfold transposes (~15 ms saved)
  synthesis top : conv1's low-res half in folded XLA -> fused_up_block
                  (FIR-up+noise+act+skip+dw+act+pw+noise+act,
                  ops/pallas/upblock.py, packed output) -> torgb as a
                  per-phase matmul epilogue INSIDE the up-block kernel (at
                  the top stage the feature store is skipped entirely)

Numerics: identical op semantics to models/migan_inference.py (the oracle);
parity is tested in tests/test_migan_pallas.py. Reference semantics:
lib/model_zoo/migan_inference.py:106-200 (SeparableConv2d / encoder blocks)
and :332-352 (synthesis skips + RGB accumulation).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from ..ops import conv2d, upsample2d
from ..ops.pallas.packedblock import fused_block_packed
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
    # The packed zone: top n_packed resolution stages run as chained
    # kernels in the w-packed 2-D view (folded channels). Three levels for
    # migan-512: 512/256/128/64 — below that, tensors are small and standard
    # XLA is fine.
    n_packed = min(5, cfg.log2res - 4)
    packed_res = [top_res >> i for i in range(n_packed)]
    p_enc = {r: fold_stage_params(enc[f"b{r}"]) for r in packed_res}
    p_syn = {r: fold_stage_params(syn[f"b{r}"]) for r in packed_res}

    # ---- encoder packed zone -------------------------------------------
    # Entry stays in the flat [N*H*W, C] view (the small 8-channel input
    # packs terribly in XLA's tiny-lane tilings — measured 45 ms at bs=128);
    # fused_block writes its output w-packed from inside the kernel, so
    # every hand-off until the packed zone's exit costs no HBM round-trip.
    xf = fold(x)
    Nf = xf.shape[0]
    p_et = p_enc[top_res]
    feat_p: Dict[int, jnp.ndarray] = {}
    # fromrgb stays an XLA flat matmul: the in-kernel wide-prologue
    # alternative (fused_block w_pre with the 128-lane byte view) measured
    # 51 ms vs 31.6 for matmul+kernel — the per-tile lane->sublane
    # relayout of the prologue output costs more than the XLA pass it
    # replaces
    y = ACT(_flat_pw(xf, p_et["fromrgb"]["weight"], p_et["fromrgb"]["bias"]))
    feat_p[top_res] = fused_block(
        y, p_et["conv1"]["conv1"]["weight"], p_et["conv1"]["conv1"]["bias"],
        p_et["conv1"]["conv2"]["weight"], interpret=interpret,
        packed_out=True)
    z_p = fused_down_block(
        feat_p[top_res], p_et["conv2"]["conv1"]["weight"],
        p_et["conv2"]["conv1"]["bias"], p_et["conv2"]["conv2"]["weight"],
        interpret=interpret, shape=(Nf, top_res, top_res), packed_out=True)
    for r in packed_res[1:]:
        p_er = p_enc[r]
        feat_p[r] = fused_block_packed(
            z_p, Nf, r, r,
            p_er["conv1"]["conv1"]["weight"], p_er["conv1"]["conv1"]["bias"],
            p_er["conv1"]["conv2"]["weight"], interpret=interpret)
        last = r == packed_res[-1]
        z_p = fused_down_block(
            feat_p[r], p_er["conv2"]["conv1"]["weight"],
            p_er["conv2"]["conv1"]["bias"], p_er["conv2"]["conv2"]["weight"],
            interpret=interpret, shape=(Nf, r, r), packed_out=not last)
    # packed-zone exit: a small folded lo-res tensor back to XLA layouts
    z = unfold(z_p)

    # ---- remaining encoder stages (standard XLA) -----------------------
    feats: Dict[int, jnp.ndarray] = {}
    for resi in cfg.encode_res[n_packed:-1]:
        z, feat = encoder_block_apply(enc[f"b{resi}"], z, None, f, down=2)
        feats[resi] = feat
    z, feat = encoder_block_apply(enc["b4"], z, None, f, down=1)
    feats[4] = feat

    # ---- synthesis below the packed zone (standard) --------------------
    p4 = syn["b4"]
    zz = sep_conv_apply(p4["conv1"], z, f)
    zz = zz + feats[4]
    zz = sep_conv_apply(p4["conv2"], zz, f)
    img = _conv1x1_apply(p4["torgb"], zz)
    for res in cfg.block_res[1:-n_packed]:
        p = syn[f"b{res}"]
        zz = sep_conv_apply(p["conv1"], zz, f, up=2, use_noise=True)
        zz = zz + feats[res]
        zz = sep_conv_apply(p["conv2"], zz, f, use_noise=True)
        img = upsample2d(img, f)
        img = img + _conv1x1_apply(p["torgb"], zz)

    # ---- synthesis packed zone -----------------------------------------
    # Per stage r: conv1's low-res half (dw+act+pw, no trailing act — the
    # act runs after the upsample inside the up-block kernel) consumes the
    # previous packed rows; the up-sampled half + encoder skip + conv2 is
    # one kernel whose output stays packed for both the next stage's conv1
    # and the block-diag torgb matmul. The 6-channel folded image branch
    # accumulates in XLA (packing it costs ~18 ms in tiny-lane tilings).
    zz = fold(zz)
    img = fold(img)
    zz_p = None
    for r in reversed(packed_res):
        p_sr = p_syn[r]
        rl = r // 2
        if zz_p is None:
            # lowest packed stage: conv1's low half as folded XLA convs
            c_in = zz.shape[-1]
            k = p_sr["conv1"]["conv1"]["weight"].shape[0]
            t = conv2d(zz, p_sr["conv1"]["conv1"]["weight"],
                       padding=k // 2, groups=c_in)
            t = ACT(t + p_sr["conv1"]["conv1"]["bias"].astype(t.dtype))
            t = conv2d(t, p_sr["conv1"]["conv2"]["weight"])
        else:
            t_flat = fused_block_packed(
                zz_p, Nf, rl, rl,
                p_sr["conv1"]["conv1"]["weight"],
                p_sr["conv1"]["conv1"]["bias"],
                p_sr["conv1"]["conv2"]["weight"], interpret=interpret,
                final_act=False, flat_out=True)
            c_r = p_sr["conv1"]["conv2"]["weight"].shape[-1]
            t = t_flat.reshape(Nf, rl, rl, c_r)
        n1 = _noise_for(p_sr["conv1"], r, r)
        n2 = _noise_for(p_sr["conv2"], r, r)
        # torgb runs as an epilogue inside the up-block kernel; at the top
        # stage the rgb rows are the ONLY consumer, so the feature store
        # (a full activation-tensor HBM write + XLA re-read) is skipped.
        top = r == top_res
        res_up = fused_up_block(
            t, feat_p[r], n1,
            p_sr["conv2"]["conv1"]["weight"], p_sr["conv2"]["conv1"]["bias"],
            p_sr["conv2"]["conv2"]["weight"], n2, interpret=interpret,
            packed_out=True,
            w_rgb=p_sr["torgb"]["weight"], b_rgb=p_sr["torgb"]["bias"],
            emit_features=not top)
        img = upsample2d(img, f)
        if top:
            y_rgb = res_up
        else:
            zz_p, y_r = res_up
            img = img + y_r.reshape(img.shape).astype(img.dtype)
    p_st = p_syn[top_res]
    Wp = top_res // 2

    # The kernel's packed rgb rows [NR, 2*crgb] and folded NHWC bytes
    # agree ([p, phase, c] -> w = 2p+k), so joining the small 6-channel
    # image branch happens in NHWC via a plain reshape (packing the img
    # branch instead costs ~18 ms in XLA's tiny-lane tilings, measured).
    crgb = img.shape[-1]                          # 6 folded rgb channels
    y_f = y_rgb.reshape(Nf, top_res, 2 * Wp, crgb)
    # (img was already upsampled to top_res in the loop's last iteration)
    return unfold(img.astype(y_f.dtype) + y_f)
