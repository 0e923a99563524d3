"""Fused [dw3x3+b -> act -> FIR-down2 -> pw1x1 -> act] as ONE Pallas TPU
kernel — the down-sampling SeparableConv2d that ends a MI-GAN encoder stage.

Reference semantics (reference: lib/model_zoo/migan_inference.py:106-170,
SeparableConv2d with down=2): the XLA composition makes ~6 full passes over
the high-resolution activation; this kernel reads the hi-res input once and
writes the quarter-size output once.

Layout (same conventions as upblock.py): the hi-res input is the "w-packed"
2-D view [N*Hh*Wp, 2C] of contiguous NHWC (Wp = Wh/2; even-w pixels in
lanes [:C], odd-w in lanes [C:]); the lo-res output is plain flat
[N*Hl*Wl, O] with Wl == Wp — so the FIR down-sampler's stride-2 w-taps are
native lane slices and its stride-2 h-taps are static row offsets.

FIR filter: the model's [1,3,3,1]/8 per axis (normalized, gain 1 for down;
zero padding (1, 1) per ops/upfirdn2d.py::downsample2d) —
  v(h, j) = (yO[j-1] + 3 yE[j] + 3 yO[j] + yE[j+1]) / 8        (w pass)
  z(i, j) = (v(2i-1) + 3 v(2i) + 3 v(2i+1) + v(2i+2)) / 8      (h pass)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sepconv import _act, _dma_for


def _kernel(x_hbm, wdw_ref, bdw_ref, wpw_ref, out_ref,
            x_scr, x_sem, v_scr,
            *, T: int, Wp: int, Hh: int, NR2: int, packed_out: bool):
    """One grid step -> T lo-res output rows (= T pixels).

    Geometry (B = i*T, all mappings static in the grid index):
      out rows  [B, B+T)         <-> lo pixels (img, i, j)
      v span     hi rows [2B/Wp - 1, 2B/Wp + 2T/Wp]  (L = 2T + 2Wp rows)
      v_scr[q]   <-> hi packed row 2B - Wp + q
      x window[p] <-> hi packed row 2B - 2*Mx + p,  Mx = 2Wp + 8

    The dw + w-direction FIR run per hi-res image row ([Wp, C] slabs) so
    f32 intermediates stay small — Mosaic's scoped-vmem stack OOMs if the
    whole span is materialized at once.
    """
    C = wdw_ref.shape[-1]
    Mx = 2 * Wp + 8
    SZX = 2 * T + 2 * Mx
    L = 2 * T + 2 * Wp                 # v span rows
    n_hi = L // Wp                     # hi-res image rows in the span
    n_lo = T // Wp                     # lo-res image rows per tile
    Hl = Hh // 2

    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    B = i * T

    xdma = lambda slot, j: _dma_for(x_hbm, x_scr, x_sem, slot, j,
                                    M=Mx, SZ=SZX, tile=2 * T, NHW=NR2)

    @pl.when(i == 0)
    def _():
        x_scr[0, 0:2 * Mx] = jnp.zeros((2 * Mx, 2 * C), x_scr.dtype)
        xdma(0, 0).start()

    @pl.when(i == n_tiles - 1)
    def _():
        x_scr[i % 2, 2 * T + 2 * Mx:2 * T + 4 * Mx] = (
            jnp.zeros((2 * Mx, 2 * C), x_scr.dtype))

    @pl.when(i + 1 < n_tiles)
    def _():
        xdma((i + 1) % 2, i + 1).start()

    xdma(i % 2, i).wait()
    xwin = x_scr.at[i % 2]

    # ---- step 1: per hi row, y = act(dw3x3(x)+b) then the w-direction
    # FIR down (w taps never cross rows):
    #   v[p] = (yO[p-1] + 3 yE[p] + 3 yO[p] + yE[p+1]) / 8
    pids = jax.lax.broadcasted_iota(jnp.int32, (Wp, 1), 0)
    m_p0 = pids > 0
    m_p1 = pids < Wp - 1
    b = bdw_ref[0].astype(jnp.float32)
    z1 = None
    for r in range(n_hi):
        h = jax.lax.rem(2 * (B // Wp) - 1 + r + 2 * Hh, Hh)
        accE = jnp.zeros((Wp, C), jnp.float32)
        accO = jnp.zeros((Wp, C), jnp.float32)
        for dy in (-1, 0, 1):
            roff = (r + 3 + dy) * Wp + 16   # window pos of this row's taps
            rows = xwin[pl.ds(roff, Wp), :].astype(jnp.float32)
            rows_m1 = xwin[pl.ds(roff - 1, Wp), :].astype(jnp.float32)
            rows_p1 = xwin[pl.ds(roff + 1, Wp), :].astype(jnp.float32)
            xE, xO = rows[:, :C], rows[:, C:]
            taps = (
                (-1, jnp.where(m_p0, rows_m1[:, C:], 0.0), xE),
                (0, xE, xO),
                (1, xO, jnp.where(m_p1, rows_p1[:, :C], 0.0)),
            )
            if dy == -1:
                hvalid = h > 0
            elif dy == 1:
                hvalid = h < Hh - 1
            else:
                hvalid = None
            for dx, srcE, srcO in taps:
                w = wdw_ref[dy + 1, dx + 1, :].astype(jnp.float32)
                if hvalid is not None:
                    w = jnp.where(hvalid, w, 0.0)
                accE = accE + srcE * w
                accO = accO + srcO * w
        yE = _act(accE + b)
        yO = _act(accO + b)
        if z1 is None:
            z1 = jnp.zeros((1, C), jnp.float32)
        yO_m1 = jnp.concatenate([z1, yO[:-1]], axis=0)
        yE_p1 = jnp.concatenate([yE[1:], z1], axis=0)
        v_scr[pl.ds(r * Wp, Wp), :] = (
            (yO_m1 + 3.0 * yE + 3.0 * yO + yE_p1) * 0.125
        ).astype(v_scr.dtype)

    # ---- step 3: h-direction FIR down + pointwise MXU matmul + act ------
    #   z(i_loc) = (v(2i-1) + 3 v(2i) + 3 v(2i+1) + v(2i+2)) / 8
    # v_scr[q] <-> hi row 2B/Wp - 1 + q/Wp; out lo row r_lo's hi row
    # (2 r_lo + dh) sits at v rows (2 r_lo + dh + 1) * Wp — static.
    for r_lo in range(n_lo):
        i_img = jax.lax.rem(B // Wp + r_lo, Hl)
        voff = (2 * r_lo + 1) * Wp

        def vrow(dh):
            return v_scr[pl.ds(voff + dh * Wp, Wp), :].astype(jnp.float32)

        z = 3.0 * vrow(0) + 3.0 * vrow(1)
        z = z + jnp.where(i_img != 0, vrow(-1), 0.0)
        z = z + jnp.where(i_img != Hl - 1, vrow(2), 0.0)
        z = z * 0.125
        out = jnp.dot(z.astype(wpw_ref.dtype), wpw_ref[:],
                      preferred_element_type=jnp.float32)
        out = _act(out).astype(out_ref.dtype)
        if packed_out:
            # flat [Wp, O] -> w-packed [Wp/2, 2O] in VMEM
            out = out.reshape(Wp // 2, 2 * out.shape[-1])
            out_ref[pl.ds(r_lo * (Wp // 2), Wp // 2), :] = out
        else:
            out_ref[pl.ds(r_lo * Wp, Wp), :] = out


def _xla_down_block(x, w_dw, b_dw, w_pw):
    """Unfused XLA composition (correctness oracle + fallback)."""
    from ...ops import downsample2d, conv2d
    from ..filters import setup_filter

    f = setup_filter([1, 3, 3, 1])
    C = x.shape[-1]
    if w_dw.ndim == 3:
        w_dw = w_dw[:, :, None, :]
    if w_pw.ndim == 2:
        w_pw = w_pw[None, None]
    y = _act(conv2d(x, w_dw, padding=1, groups=C) + b_dw.astype(x.dtype))
    y = downsample2d(y, f, down=2)
    return _act(conv2d(y, w_pw))


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile_rows", "shape",
                                    "packed_out"))
def fused_down_block(x: jnp.ndarray, w_dw: jnp.ndarray, b_dw: jnp.ndarray,
                     w_pw: jnp.ndarray, interpret: bool = False,
                     tile_rows: int = 8,
                     shape=None,
                     packed_out: bool = False) -> jnp.ndarray:
    """Fused dw3x3+b -> act -> FIR-down2 -> pw1x1 -> act.

    Args:
        x: [N, Hh, Wh, C] hi-res input (C % 128 == 0, Wh/2 % 8 == 0) — or
            its w-packed 2-D view [N*Hh*Wh/2, 2C] with `shape=(N, Hh, Wh)`
            (free hand-off from the packed encoder kernels).
        w_dw: [3,3,1,C] (or [3,3,C]) depthwise weights; b_dw: [C].
        w_pw: [1,1,C,O] (or [C,O]) pointwise weights (O % 128 == 0).
        tile_rows: lo-res image rows per grid step (auto-shrunk for VMEM).
        shape: static (N, Hh, Wh) when x is the packed 2-D view.

    Returns [N, Hh/2, Wh/2, O].
    """
    if x.ndim == 2:
        N, Hh, Wh = shape
        C = x.shape[-1] // 2
        assert x.shape == (N * Hh * (Wh // 2), 2 * C), (x.shape, shape)
        x2d_in = x
    else:
        N, Hh, Wh, C = x.shape
        x2d_in = None
    if w_dw.ndim == 4:
        w_dw = w_dw[:, :, 0, :]
    if w_pw.ndim == 4:
        w_pw = w_pw[0, 0]
    O = w_pw.shape[-1]
    Wp = Wh // 2
    Hl = Hh // 2
    NR2 = N * Hh * Wp                 # packed input rows
    R_out = N * Hl * Wp

    eligible = (C % 128 == 0 and O % 128 == 0 and Wp % 8 == 0
                and Wh % 2 == 0 and Hh % 2 == 0)
    if eligible:
        T = tile_rows * Wp
        itemsize = x.dtype.itemsize

        def vmem(T_):
            return itemsize * (
                2 * (2 * T_ + 8 * Wp + 32) * 2 * C    # x window (dbuf)
                + (2 * T_ + 2 * Wp) * C               # v
                + 2 * T_ * O)                         # out (pipelined)

        budget = 12 * 1024 * 1024
        while T > 2 * Wp and vmem(T) > budget:
            T //= 2
        # interior tiles must never clip: lo_1 = 2T - Mx >= 0 -> T >= 2Wp.
        if (T % Wp or (Hl * Wp) % T or T < 2 * Wp
                or 2 * T + 4 * Wp + 16 > NR2):
            eligible = False

    if packed_out and (Wp % 16 or Wp // 2 % 8):
        packed_out = False      # packed rows must pair within image rows
    if not eligible:
        if x2d_in is not None:
            x = x2d_in.reshape(N, Hh, Wh, C)
        y = _xla_down_block(x, w_dw, b_dw, w_pw)
        return y.reshape(R_out // 2, 2 * O) if packed_out else y

    x2d = x2d_in if x2d_in is not None else x.reshape(NR2, 2 * C)
    kernel = functools.partial(_kernel, T=T, Wp=Wp, Hh=Hh, NR2=NR2,
                               packed_out=packed_out)
    L = 2 * T + 2 * Wp
    Mx = 2 * Wp + 8

    out2d = pl.pallas_call(
        kernel,
        grid=(R_out // T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # x (HBM)
            pl.BlockSpec((3, 3, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, O), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((T // 2, 2 * O), lambda i: (i, 0),
                                memory_space=pltpu.VMEM) if packed_out else
                   pl.BlockSpec((T, O), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((R_out // 2, 2 * O), x.dtype)
                   if packed_out else
                   jax.ShapeDtypeStruct((R_out, O), x.dtype)),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * T + 4 * Mx, 2 * C), x.dtype),  # x window
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((L, C), x.dtype),                      # v
        ],
        interpret=interpret,
    )(x2d, w_dw.astype(x.dtype), b_dw.reshape(1, C).astype(x.dtype),
      w_pw.astype(x.dtype))
    return out2d if packed_out else out2d.reshape(N, Hl, Wp, O)
