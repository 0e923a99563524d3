"""Fused [FIR-up2 -> +noise -> act -> +skip -> dw3x3+b -> act -> pw1x1
(+noise) -> act] as ONE Pallas TPU kernel — the whole high-resolution half
of a MI-GAN synthesis top stage in a single HBM pass.

Reference semantics being fused (reference: lib/model_zoo/migan_inference.py:
106-170, SeparableConv2d with up=2 + per-pixel noise, plus the skip add
between conv1 and conv2 at :347-352): the XLA composition makes ~8 full
passes over the high-resolution activation; this kernel reads the LOW-res
input once, the skip once, and writes the output once (~3.5x less HBM
traffic on a stage that profiling shows is bandwidth-bound).

Layout: flat rows. Activations are 2-D views of contiguous NHWC:

  - low-res input  x_lo : [N*Hl*Wl, C]   (one row per pixel)
  - hi-res skip / out   : [N*Hh*Wl, 2C]  "w-packed" — pairs of w-adjacent
    pixels side by side in lanes (a FREE reshape of [N*Hh*Wh, C] since
    C % 128 == 0): even-w pixels are lanes [:C], odd-w are lanes [C:].

The packing turns every stride-2 access (the up-sampler's even/odd output
phases, the dw taps at w±1) into a native 128-aligned lane slice plus a
static row offset — no strided sublane gathers (unsupported by Mosaic).

The FIR filter is the model's fixed [1,3,3,1] (normalized, gain=4 for up):
per-axis 2x-upsample output weights are (0.25, 0.75)/(0.75, 0.25) for
even/odd phases — verified bit-for-bit vs ops/upfirdn2d.py in tests.

HBM windows use the clip-shift DMA scheme from sepconv._dma_for: scratch
row p always maps to logical row (j*tile - 2M + p); out-of-array rows land
in margins zeroed once at the first/last grid step.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sepconv import _act, _dma_for


def _kernel(x_hbm, skip_hbm, nz_ref, wdw_ref, bdw_ref, wpw_ref, noise2_ref,
            *refs,
            T: int, Wl: int, Hh: int, use_noise2: bool,
            NXL: int, NR: int, has_rgb: bool, emit_features: bool,
            planar: bool = False, phase_input: bool = False):
    """One grid step -> T packed output rows (= 2T hi-res pixels).

    refs order: [wrgb, brgb (if has_rgb)], [out (if emit_features)],
    [rgb (if has_rgb)], then scratch x_scr/x_sem/s_scr/s_sem/t_scr.

    Packed row q = (img*Hh + h)*Wl + p holds hi-res pixels (h, 2p) in lanes
    [:C] and (h, 2p+1) in lanes [C:]. Wl is both the low-res width and the
    packed-row count per hi-res image row.

    Static geometry (Ms = 2*Wl margin keeps the t-span base h-parity even):
      t_scr[q]          <-> packed row  base - 2Wl + q,  q in [0, T+4Wl)
      skip window[p]    <-> packed row  i*T  - 4Wl + p   (SZ = T + 4Wl)
      x window[p]       <-> lo-res row  i*T/2 - 4Wl + p  (SZ = T/2 + 4Wl)
      nz_ref[0, q]      <-> noise at packed row base - 2Wl + q (pre-gathered
                            overlapping windows: 2-lane arrays can't be
                            manually DMA'd, Mosaic needs 128-aligned slices)
    """
    it = iter(refs)
    wrgb_ref = next(it) if has_rgb else None
    brgb_ref = next(it) if has_rgb else None
    out_ref = next(it) if emit_features else None
    rgb_ref = next(it) if has_rgb else None
    x_scr, x_sem, s_scr, s_sem, t_scr = list(it)
    C = wdw_ref.shape[-1]
    XC = 4 * C if phase_input else C      # phase_input: x rows carry the
    Ms = 2 * Wl                           # 4 up-phases as channel groups
    SPAN = T + 2 * Ms                 # t rows computed per tile
    n_hi = SPAN // Wl                 # hi-res image rows in the span
    SZ_S = T + 2 * Ms
    SZ_X = T // 2 + 2 * Ms

    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    base = i * T

    xdma = lambda slot, j: _dma_for(x_hbm, x_scr, x_sem, slot, j,
                                    M=Ms, SZ=SZ_X, tile=T // 2, NHW=NXL)
    sdma = lambda slot, j: _dma_for(skip_hbm, s_scr, s_sem, slot, j,
                                    M=Ms, SZ=SZ_S, tile=T, NHW=NR)

    @pl.when(i == 0)
    def _():
        x_scr[0, 0:2 * Ms] = jnp.zeros((2 * Ms, XC), x_scr.dtype)
        s_scr[0, 0:2 * Ms] = jnp.zeros((2 * Ms, 2 * C), s_scr.dtype)
        xdma(0, 0).start()
        sdma(0, 0).start()

    @pl.when(i == n_tiles - 1)
    def _():
        slot = i % 2
        x_scr[slot, T // 2 + 2 * Ms:T // 2 + 4 * Ms] = (
            jnp.zeros((2 * Ms, XC), x_scr.dtype))
        s_scr[slot, T + 2 * Ms:T + 4 * Ms] = (
            jnp.zeros((2 * Ms, 2 * C), s_scr.dtype))

    @pl.when(i + 1 < n_tiles)
    def _():
        xdma((i + 1) % 2, i + 1).start()
        sdma((i + 1) % 2, i + 1).start()

    xdma(i % 2, i).wait()
    sdma(i % 2, i).wait()
    xwin = x_scr.at[i % 2]
    swin = s_scr.at[i % 2]
    # full-block read: Mosaic rejects partial slices of a 2-lane ref
    nwin = nz_ref[:].astype(jnp.float32)

    # -----------------------------------------------------------------
    # Step 1: t = act(up2(x_lo) + noise) + skip over the span, into t_scr.
    # Per hi-res image row: all window offsets are STATIC (derivation in
    # fused_up_block's docstring); image seams use traced scalar masks.
    # -----------------------------------------------------------------
    base_h = base // Wl - 2            # hi row of t-span start (even)
    for r in range(n_hi):
        parity = r % 2                 # static: base_h is even
        j_rel = (r - parity) // 2
        h_img = jax.lax.rem(base_h + r + 2 * Hh, Hh)  # rem of a >=0 value

        def lo_row(jr):
            return xwin[pl.ds((jr + 3) * Wl, Wl), :].astype(jnp.float32)

        if phase_input:
            # The producer already folded the up2-FIR into its pointwise
            # conv as 4 phase-weighted 2x2 convs (ops/conv.pw_up2_phase):
            # lo row j's channel group [parity*2C, (parity+1)*2C) IS the
            # packed hi-res row (h = 2j + parity, both w phases) — one
            # contiguous 128-aligned lane slice, zero stencil arithmetic
            # and no seam masks on the VPU.
            t_row = xwin[pl.ds((j_rel + 3) * Wl, Wl),
                         pl.ds(parity * 2 * C, 2 * C)].astype(jnp.float32)
        elif parity == 0:  # h = 2j: 0.25*x[j-1] + 0.75*x[j]
            u = 0.75 * lo_row(j_rel)
            u = u + jnp.where(h_img != 0, 0.25 * lo_row(j_rel - 1), 0.0)
        else:              # h = 2j+1: 0.75*x[j] + 0.25*x[j+1]
            u = 0.75 * lo_row(j_rel)
            u = u + jnp.where(h_img != Hh - 1,
                              0.25 * lo_row(j_rel + 1), 0.0)
        if not phase_input:
            # w-interp: E[p]=.25*u[p-1]+.75*u[p]; O[p]=.75*u[p]+.25*u[p+1]
            z1 = jnp.zeros((1, C), jnp.float32)
            u_m1 = jnp.concatenate([z1, u[:-1]], axis=0)
            u_p1 = jnp.concatenate([u[1:], z1], axis=0)
            t_row = jnp.concatenate(
                [0.25 * u_m1 + 0.75 * u, 0.75 * u + 0.25 * u_p1], axis=1)
        nz = jax.lax.slice(nwin, (r * Wl, 0), ((r + 1) * Wl, 2))
        t_row = _act_noise(t_row, nz, C)
        t_row = t_row + swin[pl.ds(r * Wl + 2 * Wl, Wl), :].astype(
            jnp.float32)
        t_scr[pl.ds(r * Wl, Wl), :] = t_row.astype(t_scr.dtype)

    # -----------------------------------------------------------------
    # Step 2: dw3x3 + bias -> act on the T tile rows (t_scr offset 2Wl).
    # -----------------------------------------------------------------
    ids = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0) + base
    p_col = jax.lax.rem(ids, Wl)                  # packed (lo-res) w index
    h_row = jax.lax.rem(jax.lax.div(ids, Wl), Hh)

    # Masks hoisted (the VPU limits this kernel): the two image-column
    # corner taps get one select each, and the h-seam select applies once
    # per dy on the combined 3-tap term instead of per tap.
    mE = p_col > 0
    mO = p_col < Wl - 1
    accE = jnp.zeros((T, C), jnp.float32)
    accO = jnp.zeros((T, C), jnp.float32)
    for dy in (-1, 0, 1):
        roff = 2 * Wl + dy * Wl
        rows = t_scr[pl.ds(roff, T), :].astype(jnp.float32)
        rows_m1 = t_scr[pl.ds(roff - 1, T), :].astype(jnp.float32)
        rows_p1 = t_scr[pl.ds(roff + 1, T), :].astype(jnp.float32)
        tE, tO = rows[:, :C], rows[:, C:]
        w_l = wdw_ref[dy + 1, 0, :].astype(jnp.float32)
        w_c = wdw_ref[dy + 1, 1, :].astype(jnp.float32)
        w_r = wdw_ref[dy + 1, 2, :].astype(jnp.float32)
        eterm = (jnp.where(mE, rows_m1[:, C:], 0.0) * w_l
                 + tE * w_c + tO * w_r)
        oterm = (tE * w_l + tO * w_c
                 + jnp.where(mO, rows_p1[:, :C], 0.0) * w_r)
        if dy == -1:
            hmask = h_row > 0
            eterm = jnp.where(hmask, eterm, 0.0)
            oterm = jnp.where(hmask, oterm, 0.0)
        elif dy == 1:
            hmask = h_row < Hh - 1
            eterm = jnp.where(hmask, eterm, 0.0)
            oterm = jnp.where(hmask, oterm, 0.0)
        accE = accE + eterm
        accO = accO + oterm

    b = bdw_ref[0].astype(jnp.float32)
    yE = _act(accE + b)
    yO = _act(accO + b)

    # -----------------------------------------------------------------
    # Step 3: pointwise MXU matmul (+noise2) -> act, packed write-out.
    # -----------------------------------------------------------------
    outE = jnp.dot(yE.astype(wpw_ref.dtype), wpw_ref[:],
                   preferred_element_type=jnp.float32)
    outO = jnp.dot(yO.astype(wpw_ref.dtype), wpw_ref[:],
                   preferred_element_type=jnp.float32)
    if use_noise2:
        nz2 = noise2_ref[:].astype(jnp.float32)
        outE = outE + nz2[:, 0:1]
        outO = outO + nz2[:, 1:2]
    aE = _act(outE)
    aO = _act(outO)
    if emit_features:
        out = jnp.concatenate([aE, aO], axis=1)
        out_ref[:] = out.astype(out_ref.dtype)
    if has_rgb:
        # fused torgb: per-phase matmul to the (folded) rgb channels; at
        # the top stage this replaces a full re-read of the 4-ch-GB
        # feature tensor in XLA.
        wr = wrgb_ref[:]
        br = brgb_ref[0].astype(jnp.float32)
        yE = jnp.dot(aE.astype(wr.dtype), wr,
                     preferred_element_type=jnp.float32) + br
        yO = jnp.dot(aO.astype(wr.dtype), wr,
                     preferred_element_type=jnp.float32) + br
        if not planar:
            # packed store [T, 2cr] — a [R, 12]{1,0} HBM tensor is
            # lane-PADDED ~10x by the (8,128) tiling; downstream XLA pays
            # ~17 ms reshaping+transposing it to NHWC at 512-res/bs128.
            rgb = jnp.concatenate([yE, yO], axis=1)
            rgb_ref[:] = rgb.astype(rgb_ref.dtype)
        else:
            # PLANAR store [1, 2, cr, nh, Wl] (phase, channel, h, packed-w):
            # an in-VMEM f32 transpose + 128-aligned lane->sublane reshape
            # (Wl % 128 == 0 gated by the host) makes the HBM tensor
            # UNPADDED W-minor planes — the downstream rgb image pyramid
            # then runs as pure matmuls with no NHWC relayout at all.
            cr = yE.shape[1]
            nh = T // Wl
            rgb_ref[0, 0] = yE.T.reshape(cr, nh, Wl).astype(rgb_ref.dtype)
            rgb_ref[0, 1] = yO.T.reshape(cr, nh, Wl).astype(rgb_ref.dtype)


def _act_noise(t_row, nz, C):
    """act(t + noise) where noise column 0 is the even-pixel scalar and
    column 1 the odd-pixel scalar of each packed row."""
    t = t_row + jnp.concatenate(
        [jnp.broadcast_to(nz[:, 0:1], (nz.shape[0], C)),
         jnp.broadcast_to(nz[:, 1:2], (nz.shape[0], C))], axis=1)
    return _act(t)


def _xla_up_block_phase(x4, skip, noise_up, w_dw, b_dw, w_pw, noise2):
    """Unfused XLA composition of the PHASE-INPUT variant: interleave the
    4 phase channel groups to the hi-res grid (pure depth-to-space — the
    FIR already happened in the producer), then noise/act/skip/dw/pw."""
    from ...ops import conv2d

    N, Hl, Wl, XC = x4.shape
    C = XC // 4
    t = x4.reshape(N, Hl, Wl, 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    t = t.reshape(N, 2 * Hl, 2 * Wl, C)
    t = _act(t + noise_up[None, :, :, None].astype(t.dtype))
    t = t + skip
    if w_dw.ndim == 3:
        w_dw = w_dw[:, :, None, :]
    if w_pw.ndim == 2:
        w_pw = w_pw[None, None]
    y = _act(conv2d(t, w_dw, padding=1, groups=C) + b_dw.astype(t.dtype))
    y = conv2d(y, w_pw)
    if noise2 is not None:
        y = y + noise2[None, :, :, None].astype(y.dtype)
    return _act(y)


def _xla_up_block(x_lo, skip, noise_up, w_dw, b_dw, w_pw, noise2):
    """Unfused XLA composition (correctness oracle + fallback)."""
    from ...ops import upsample2d, conv2d
    from ..filters import setup_filter

    f = setup_filter([1, 3, 3, 1])
    t = upsample2d(x_lo, f, up=2)
    t = _act(t + noise_up[None, :, :, None].astype(t.dtype))
    t = t + skip
    C = t.shape[-1]
    if w_dw.ndim == 3:
        w_dw = w_dw[:, :, None, :]
    if w_pw.ndim == 2:
        w_pw = w_pw[None, None]
    y = _act(conv2d(t, w_dw, padding=1, groups=C) + b_dw.astype(t.dtype))
    y = conv2d(y, w_pw)
    if noise2 is not None:
        y = y + noise2[None, :, :, None].astype(y.dtype)
    return _act(y)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile_rows", "packed_out",
                                    "emit_features", "rgb_planar",
                                    "phase_input"))
def fused_up_block(x_lo: jnp.ndarray, skip: jnp.ndarray,
                   noise_up: jnp.ndarray,
                   w_dw: jnp.ndarray, b_dw: jnp.ndarray, w_pw: jnp.ndarray,
                   noise2: Optional[jnp.ndarray] = None,
                   interpret: bool = False,
                   tile_rows: int = 8,
                   packed_out: bool = False,
                   w_rgb: Optional[jnp.ndarray] = None,
                   b_rgb: Optional[jnp.ndarray] = None,
                   emit_features: bool = True,
                   rgb_planar: bool = False,
                   phase_input: bool = False):
    """Fused up2 + noise + act + skip + dw/pw sepconv (+noise2) + act.

    Args:
        x_lo:  [N, Hl, Wl, C] low-res input (C % 128 == 0, Wl % 8 == 0).
        skip:  [N, 2Hl, 2Wl, C] high-res skip added after up/noise/act —
            or its w-packed 2-D view [N*2Hl*Wl, 2C] (free hand-off from the
            packed encoder kernels).
        noise_up: [2Hl, 2Wl] pre-scaled per-pixel noise for the up output.
        w_dw: [3,3,1,C] (or [3,3,C]) depthwise weights; b_dw: [C].
        w_pw: [1,1,C,O] (or [C,O]) pointwise weights (O % 128 == 0).
        noise2: optional [2Hl, 2Wl] noise added after the pointwise conv.
        tile_rows: hi-res image rows per grid step (auto-shrunk for VMEM).
        packed_out: return the w-packed [N*2Hl*Wl, 2O] view instead of NHWC
            (the [R,O]->[R/2,2O] reshape is a real relayout on TPU; packed
            consumers should take this directly).
        w_rgb/b_rgb: optional fused torgb epilogue [O, Cr] / [Cr] — also
            returns the packed rgb rows [N*2Hl*Wl, 2*Cr]. (A wide-row
            [N*2Hl, Wl*2Cr] store would avoid HBM lane padding, but the
            (T, 2Cr) -> (T/Wl, Wl*2Cr) VMEM relayout needs 128-aligned
            lane groups and fails Mosaic lowering at Cr=6.) At a model's
            top stage pass emit_features=False: the rgb rows are the only
            consumer, and skipping the feature store saves a full
            activation-tensor HBM write plus its XLA re-read.
        rgb_planar: return the rgb as W-minor PLANES [N, 2, Cr, 2Hl, Wl]
            (phase, folded-channel, h, packed-w) instead of packed rows.
            When Wl % 128 == 0 the kernel stores this directly (an in-VMEM
            f32 transpose + 128-aligned lane->sublane reshape): the HBM
            tensor is UNPADDED, where the packed [R, 2Cr] rows are
            lane-padded 128/(2Cr) ~ 10x and XLA's downstream
            reshape+transpose to NHWC measured ~17 ms at 512-res/bs128.
            At smaller Wl (or in the XLA fallback) the packed rows are
            converted host-side — tiny tensors there. Consumers run the
            rgb image pyramid as banded matmuls on these planes
            (models/migan_pallas), never touching an NHWC rgb layout.

    Returns the features ([N, 2Hl, 2Wl, O], or packed when packed_out);
    with w_rgb a tuple (features, rgb) — or just rgb when
    emit_features=False.

    phase_input: x_lo is [N, Hl, Wl, 4C] — the output of
        ops.conv.pw_up2_phase, which folds the up2-FIR into the
        preceding pointwise conv as 4 phase-weighted 2x2 convs on the
        MXU (channel group (ph*2 + pw)*C + c = up-phase (ph, pw)).
        Step 1's VPU stencil (row shifts, w-interp concats, seam masks)
        collapses to one contiguous lane slice per row; the kernel reads
        4x the x bytes in exchange (hi-res-sized instead of lo-res).

    Static-offset derivation for the kernel's step 1 (x window positions):
      hi row h_glob = base_h + r with base_h = i*T/Wl - 2 (even since
      T % 2Wl == 0); its source lo rows are j = (h_glob - parity)/2 {, ±1};
      the x window maps scratch[p] <-> lo row i*T/2 - 4Wl + p, so row j
      sits at ((r - parity)/2 + 3 ± 1) * Wl — independent of i.
    """
    N, Hl, Wl, XC = x_lo.shape
    C = XC // 4 if phase_input else XC
    if w_dw.ndim >= 3:
        assert C == w_dw.shape[-1], (x_lo.shape, w_dw.shape, phase_input)
    Hh, Wh = 2 * Hl, 2 * Wl
    if skip.ndim == 2:
        assert skip.shape == (N * Hh * Wl, 2 * C), (skip.shape, x_lo.shape)
        skip = skip.reshape(N, Hh, Wh, C)
    if w_dw.ndim == 4:
        w_dw = w_dw[:, :, 0, :]
    if w_pw.ndim == 4:
        w_pw = w_pw[0, 0]
    O = w_pw.shape[-1]

    Rp_img = Hh * Wl                  # packed rows per image
    NR = N * Rp_img
    NXL = N * Hl * Wl
    eligible = (C % 128 == 0 and O % 128 == 0 and Wl % 8 == 0)
    if eligible:
        T = tile_rows * Wl
        itemsize = x_lo.dtype.itemsize

        def vmem(T_):
            return itemsize * (
                (T_ + 4 * Wl) * 2 * C          # t scratch
                + 2 * (T_ + 8 * Wl) * 2 * C    # skip window (dbuf)
                + 2 * (T_ // 2 + 8 * Wl) * XC  # x window (dbuf)
                + 2 * (T_ + 8 * Wl) * 128      # noise window (lane-padded)
                + 2 * T_ * 2 * O)              # out (pipelined)

        # vmem() counts the declared buffers; Mosaic additionally stack-
        # allocates the step-2 f32 temporaries (~T*2C*4 each), which at
        # C=1024 geometries pushed the scoped total past the 16M hard
        # limit (measured: 17.05M at C=1024/Wl=32/T=256 — compile error,
        # caught by scripts/bench_stage_floors.py). The tighter budget
        # for C >= 1024 halves T exactly there; all other stages keep
        # their tuned tiles.
        budget = (12 if C < 1024 else 6) * 1024 * 1024
        while T > 4 * Wl and vmem(T) > budget:
            T //= 2
        # geometry gates: fixed span parity, tiles divide images, windows
        # fit inside the arrays (clip-shift DMA needs SZ <= array rows),
        # and interior tiles never clip (x window lo_1 = T/2 - 2Wl >= 0,
        # else shifted landings would read unzeroed margin rows).
        if (T % (2 * Wl) or Rp_img % T or T < 4 * Wl
                or T + 4 * Wl > NR or T // 2 + 4 * Wl > NXL):
            eligible = False

    has_rgb = w_rgb is not None
    if has_rgb and w_rgb.ndim == 4:
        w_rgb = w_rgb[0, 0]

    def to_planar(rgb2d, cr):
        # packed rows [NR, 2cr] (lanes = [E cr | O cr]) -> planes
        # [N, 2, cr, Hh, Wl]; rows are (n, h, p) so this is one transpose.
        return rgb2d.reshape(N, Hh, Wl, 2, cr).transpose(0, 3, 4, 1, 2)

    if not eligible:
        xla_fn = _xla_up_block_phase if phase_input else _xla_up_block
        y = xla_fn(x_lo, skip, noise_up, w_dw, b_dw, w_pw, noise2)
        yp = y.reshape(NR, 2 * y.shape[-1]) if packed_out else y
        if not has_rgb:
            return yp
        cr = w_rgb.shape[-1]
        rgb = (y.reshape(NR * 2, O) @ w_rgb.astype(y.dtype)
               + b_rgb.astype(y.dtype)).reshape(NR, 2 * cr)
        if rgb_planar:
            rgb = to_planar(rgb, cr)
        return (yp, rgb) if emit_features else rgb

    use_noise2 = noise2 is not None
    x2d = x_lo.reshape(NXL, XC)
    s2d = skip.reshape(NR, 2 * C)
    nh_blocks = Rp_img // T
    SPAN = T + 4 * Wl
    # Noise for the up output, pre-gathered into per-tile OVERLAPPING span
    # windows [nh_blocks, SPAN, 2] (noise repeats per image, so tile i uses
    # window i % nh_blocks). Mosaic can't manually DMA a 2-lane array
    # (slices must be 128-aligned in the minor dim), but blocked specs
    # pipeline it fine — and at 2 lanes the duplicated margins are <1% of
    # the skip traffic.
    nz_p = noise_up.reshape(Rp_img, 2).astype(x_lo.dtype)
    span_idx = (jnp.arange(nh_blocks)[:, None] * T
                + jnp.arange(-2 * Wl, T + 2 * Wl)[None, :]) % Rp_img
    nz_win = nz_p[span_idx].reshape(nh_blocks * SPAN, 2)
    if use_noise2:
        nz2 = noise2.reshape(Rp_img, 2).astype(x_lo.dtype)
    else:
        nz2 = jnp.zeros((Rp_img, 2), x_lo.dtype)

    # Planar rgb store needs 128-aligned lane groups for the in-kernel
    # (cr, T) -> (cr, nh, Wl) reshape; smaller Wl converts host-side.
    planar_store = has_rgb and rgb_planar and Wl % 128 == 0

    kernel = functools.partial(_kernel, T=T, Wl=Wl, Hh=Hh,
                               use_noise2=use_noise2, NXL=NXL, NR=NR,
                               has_rgb=has_rgb, emit_features=emit_features,
                               planar=planar_store, phase_input=phase_input)

    out_specs = []
    out_shape = []
    if emit_features:
        out_specs.append(pl.BlockSpec((T, 2 * O), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((NR, 2 * O), x_lo.dtype))
    if has_rgb:
        cr = w_rgb.shape[-1]
        if planar_store:
            nh = T // Wl
            out_specs.append(pl.BlockSpec(
                (1, 2, cr, nh, Wl),
                lambda i: (i // nh_blocks, 0, 0, i % nh_blocks, 0),
                memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((N, 2, cr, Hh, Wl),
                                                  x_lo.dtype))
        else:
            out_specs.append(pl.BlockSpec((T, 2 * cr), lambda i: (i, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((NR, 2 * cr), x_lo.dtype))

    extra_args = []
    extra_specs = []
    if has_rgb:
        extra_args = [w_rgb.astype(x_lo.dtype),
                      b_rgb.reshape(1, -1).astype(x_lo.dtype)]
        extra_specs = [
            pl.BlockSpec((O, cr), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cr), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]

    outs = pl.pallas_call(
        kernel,
        grid=(NR // T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # x_lo   (HBM)
            pl.BlockSpec(memory_space=pl.ANY),    # skip   (HBM)
            pl.BlockSpec((SPAN, 2), lambda i: (i % nh_blocks, 0),
                         memory_space=pltpu.VMEM),  # noise windows
            pl.BlockSpec((3, 3, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, O), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 2), lambda i: (i % nh_blocks, 0),
                         memory_space=pltpu.VMEM),  # noise2
        ] + extra_specs,
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        out_shape=out_shape if len(out_shape) > 1 else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((2, T // 2 + 8 * Wl, XC), x_lo.dtype),  # x window
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, T + 8 * Wl, 2 * C), x_lo.dtype),    # skip window
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((T + 4 * Wl, 2 * C), x_lo.dtype),       # t
        ],
        interpret=interpret,
    )(x2d, s2d, nz_win, w_dw.astype(x_lo.dtype),
      b_dw.reshape(1, C).astype(x_lo.dtype), w_pw.astype(x_lo.dtype), nz2,
      *extra_args)
    if not has_rgb:
        out2d = outs
        return out2d if packed_out else out2d.reshape(N, Hh, Wh, O)
    if not emit_features:
        rgb = outs if not isinstance(outs, (tuple, list)) else outs[0]
        if rgb_planar and not planar_store:
            rgb = to_planar(rgb, cr)
        return rgb
    out2d, rgb = outs
    feat = out2d if packed_out else out2d.reshape(N, Hh, Wh, O)
    if rgb_planar and not planar_store:
        rgb = to_planar(rgb, cr)
    return feat, rgb
