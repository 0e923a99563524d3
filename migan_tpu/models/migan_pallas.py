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

import functools
from typing import Any, Dict

import numpy as np
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


@functools.lru_cache(maxsize=None)
def _up2_mat(w_in: int) -> np.ndarray:
    """1-D FIR up-2 as a dense banded matrix U [w_in, 2*w_in], numerically
    identical to ops/upfirdn2d.upsample2d with the model's [1,3,3,1] filter
    (per-axis taps 0.25/0.75, zero-pad clipping at the edges — verified by
    delta-response against the oracle in tests/test_migan_pallas.py)."""
    U = np.zeros((w_in, 2 * w_in), np.float32)
    for q in range(w_in):
        for dm, wt in ((-1, 0.25), (0, 0.75), (1, 0.75), (2, 0.25)):
            m = 2 * q + dm
            if 0 <= m < 2 * w_in:
                U[q, m] += wt
    return U


def _up2_planar(E: jnp.ndarray, O: jnp.ndarray):
    """FIR up-2 of a phase-planar rgb image pair.

    E/O: [Nf, C, h, wl] hold the even-w / odd-w pixel planes (w = 2p + φ).
    The up-sample is linear, so it is four banded matmuls along lanes (the
    w axis, phase-mixing) + one along sublanes (the h axis) — W-minor
    layouts throughout, never an NHWC rgb tensor (whose 6-lane tiling is
    ~21x padded on TPU and costs real HBM copies, see ROADMAP)."""
    h, wl = E.shape[2], E.shape[3]
    U = jnp.asarray(_up2_mat(2 * wl))           # (2wl, 4wl), true-w indexed
    A_EE, A_EO = U[0::2, 0::2], U[0::2, 1::2]   # (wl, 2wl) each
    A_OE, A_OO = U[1::2, 0::2], U[1::2, 1::2]
    dt = E.dtype

    def mm(x, a):
        return jnp.einsum("nchw,wm->nchm", x, a.astype(dt),
                          preferred_element_type=jnp.float32)

    E1 = mm(E, A_EE) + mm(O, A_OE)
    O1 = mm(E, A_EO) + mm(O, A_OO)
    Uh = jnp.asarray(_up2_mat(h)).astype(dt)    # (h, 2h)

    def mh(x):
        return jnp.einsum("nchw,hg->ncgw", x, Uh,
                          preferred_element_type=jnp.float32).astype(dt)

    return mh(E1), mh(O1)


def pallas_stage_eligible(cfg: GeneratorConfig, n: int) -> bool:
    """The top stage runs the Pallas chain when its channel count fills
    TPU lanes — directly (migan-256: C=128) or after batch-folding image
    pairs into channels (migan-512: C=64, the fold condition)."""
    return _fold_factor(cfg, n) > 0


def _fold_factor(cfg: GeneratorConfig, n: int) -> int:
    """0 = chain ineligible; 1 = run unfolded; 2 = fold image pairs."""
    top_res = cfg.encode_res[0]
    c_top = cfg.ch(top_res)
    # the packed ladder needs >= 2 levels (the single-level geometry never
    # unpacks the down-block hand-off) and whole-sublane packed rows
    if cfg.log2res - 4 < 2 or top_res // 2 % 8 or n < 2:
        return 0
    if c_top % 128 == 0:
        return 1
    if c_top < 128 and (2 * c_top) % 128 == 0 and n % 2 == 0:
        return 2
    return 0


def generator_apply_pallas(params: Params, x: jnp.ndarray,
                           cfg: GeneratorConfig,
                           interpret: bool = False,
                           out_layout: str = "nhwc") -> jnp.ndarray:
    """Forward with Pallas-fused, batch-folded top stages. Falls back to
    the standard path when the geometry doesn't apply.

    out_layout: "nhwc" (default) or "nchw". The chain's rgb pyramid is
    phase-planar W-minor, so the NCHW exit is a single dense interleave —
    the NHWC exit additionally pays a (~10x lane-padded) 3-channel-minor
    tiling whenever the jit output is materialized.
    """
    assert out_layout in ("nhwc", "nchw")
    from .migan_inference import generator_apply

    ff = _fold_factor(cfg, x.shape[0])
    if ff == 0:
        y = generator_apply(params, x, cfg)
        return y.transpose(0, 3, 1, 2) if out_layout == "nchw" else y

    top_res = cfg.encode_res[0]
    f = resample_filter()
    enc = params["encoder"]
    syn = params["synthesis"]
    # The packed zone: the top n_packed resolution stages run as chained
    # kernels in the w-packed 2-D view — five levels for migan-512
    # (512..32); below that, tensors are small and standard XLA is fine.
    n_packed = min(5, cfg.log2res - 4)
    packed_res = [top_res >> i for i in range(n_packed)]
    if ff == 2:      # migan-512: fold image pairs to fill the 128 lanes
        p_enc = {r: fold_stage_params(enc[f"b{r}"]) for r in packed_res}
        p_syn = {r: fold_stage_params(syn[f"b{r}"]) for r in packed_res}
    else:            # migan-256: C_top = 128 — the chain runs unfolded
        p_enc = {r: enc[f"b{r}"] for r in packed_res}
        p_syn = {r: syn[f"b{r}"] for r in packed_res}

    # ---- encoder packed zone -------------------------------------------
    # Entry stays in the flat [N*H*W, C] view (the small 8-channel input
    # packs terribly in XLA's tiny-lane tilings — measured 45 ms at bs=128);
    # fused_block writes its output w-packed from inside the kernel, so
    # every hand-off until the packed zone's exit costs no HBM round-trip.
    xf = fold(x) if ff == 2 else x
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
    # packed-zone exit: a small (folded) lo-res tensor back to XLA layouts
    z = unfold(z_p) if ff == 2 else z_p

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
    # and the torgb epilogue. The 6-channel folded image branch accumulates
    # PHASE-PLANAR (even/odd-w planes [Nf, 6, h, wl], W-minor, unpadded):
    # the kernels store rgb planes directly at Wl % 128 == 0 levels and the
    # FIR image pyramid is pure matmuls (_up2_planar) — no NHWC rgb tensor
    # ever exists, killing the ~15 ms reshape+transpose exit that both an
    # NHWC join and tiny-lane packing cost (profiled; see ROADMAP).
    if ff == 2:
        zz = fold(zz)
        img = fold(img)
    crgb = img.shape[-1]                          # 3 rgb (x ff if folded)
    hr, wr = img.shape[1], img.shape[2]
    P = img.reshape(Nf, hr, wr // 2, 2, crgb).transpose(0, 3, 4, 1, 2)
    E, O = P[:, 0], P[:, 1]                       # [Nf, crgb, hr, wr/2]
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
        # stage the rgb planes are the ONLY consumer, so the feature store
        # (a full activation-tensor HBM write + XLA re-read) is skipped.
        top = r == top_res
        res_up = fused_up_block(
            t, feat_p[r], n1,
            p_sr["conv2"]["conv1"]["weight"], p_sr["conv2"]["conv1"]["bias"],
            p_sr["conv2"]["conv2"]["weight"], n2, interpret=interpret,
            packed_out=True,
            w_rgb=p_sr["torgb"]["weight"], b_rgb=p_sr["torgb"]["bias"],
            emit_features=not top, rgb_planar=True)
        rgb5 = res_up if top else res_up[1]
        if not top:
            zz_p = res_up[0]
        E, O = _up2_planar(E, O)
        E = E + rgb5[:, 0].astype(E.dtype)
        O = O + rgb5[:, 1].astype(O.dtype)
    Wp = top_res // 2

    # planes -> image, the program's ONLY rgb relayout: folded channel
    # cf = j*3 + c3 holds image n = ff*m + j (fold()), w = 2p + phase
    # (j collapses when ff == 1).
    x = jnp.stack([E, O], axis=-1)                # (m, cf, h, p, phase)
    if out_layout == "nchw":
        # (m, cf=j*3+c3, h, p, phase) is ALREADY row-major NCHW order:
        # one reshape splits cf->(j, c3) and merges (m,j)->n, (p,phase)->w.
        # W-minor and dense (W % 128 == 0), so the jit boundary never
        # materializes the ~10x lane-padded NHWC tiling that a 3-channel
        # minor dim costs — the reference's own deploy artifact is NCHW
        # (lib/model_zoo/migan_inference.py:362-369 returns torch NCHW).
        return x.reshape(ff * Nf, 3, top_res, 2 * Wp)
    x = x.reshape(Nf, ff, 3, top_res, Wp, 2)      # (m, j, c3, h, p, phase)
    x = x.transpose(0, 1, 3, 4, 5, 2)             # (m, j, h, p, phase, c3)
    return x.reshape(ff * Nf, top_res, 2 * Wp, 3)
