"""Fused SeparableConv2d body in the w-packed layout, as one Pallas kernel.

Same semantics as sepconv.fused_sepconv — [dw3x3+b -> act -> pw1x1 (+noise)
-> act] (reference: lib/model_zoo/migan_inference.py:106-170 with up=down=1)
— but both input and output live in the "w-packed" 2-D view used by the
up/down-block kernels:

    [N, H, W, C] -> [N*H*(W/2), 2C]   (even-w pixels in lanes [:C],
                                       odd-w pixels in lanes [C:])

Why: the flat [N*H*W, C] <-> packed [N*H*W/2, 2C] reshape is NOT free on
TPU — the (8, 128) tiled layouts differ, and XLA materializes a full HBM
round-trip (~13 ms on the migan-512 top stage at batch 128, measured with
scripts/profile_fwd.py). Keeping every kernel in the chain packed moves the
conversion cost to the chain's tiny entry tensors instead.

Tap structure for the packed dw conv (per packed row q = (img*H + h)*Wp + p,
phases E = lanes [:C] (w=2p), O = lanes [C:] (w=2p+1)):

    E: w-1 -> O of packed row q-1 (masked p>0),  w -> E(q),  w+1 -> O(q)
    O: w-1 -> E(q),  w -> O(q),  w+1 -> E of q+1 (masked p<Wp-1)

each at h offsets dy*Wp. Masks are hoisted: the two image-column corner taps
get a per-row select, and the h-seam mask is applied once per dy on the
combined 3-tap row term — ~10 vector selects per tile instead of ~24 (the
VPU, not the DMA stream, limits these kernels).

HBM windowing follows sepconv.py's clip-shift DMA scheme (zeroed margins at
the array ends, double-buffered async copies).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sepconv import _act, _dma_for


def _kernel(x_hbm, wdw_ref, bdw_ref, wpw_ref, nz_ref, out_ref,
            x_scr, x_sem,
            *, T: int, Wp: int, H: int, RP: int, use_noise: bool,
            final_act: bool, flat_out: bool):
    """One grid step -> T packed output rows (= 2T pixels)."""
    C = wdw_ref.shape[-1]
    M = Wp + 8
    SZ = T + 2 * M

    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    base = i * T

    dma = lambda slot, j: _dma_for(x_hbm, x_scr, x_sem, slot, j,
                                   M=M, SZ=SZ, tile=T, NHW=RP)

    @pl.when(i == 0)
    def _():
        x_scr[0, 0:2 * M] = jnp.zeros((2 * M, 2 * C), x_scr.dtype)
        dma(0, 0).start()

    @pl.when(i == n_tiles - 1)
    def _():
        x_scr[i % 2, T + 2 * M:T + 4 * M] = (
            jnp.zeros((2 * M, 2 * C), x_scr.dtype))

    @pl.when(i + 1 < n_tiles)
    def _():
        dma((i + 1) % 2, i + 1).start()

    dma(i % 2, i).wait()
    win = x_scr.at[i % 2]

    ids = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0) + base
    p_col = jax.lax.rem(ids, Wp)
    h_row = jax.lax.rem(jax.lax.div(ids, Wp), H)
    mE = p_col > 0            # E's w-1 tap crosses the image-row start
    mO = p_col < Wp - 1       # O's w+1 tap crosses the image-row end

    accE = jnp.zeros((T, C), jnp.float32)
    accO = jnp.zeros((T, C), jnp.float32)
    for dy in (-1, 0, 1):
        roff = 2 * M + dy * Wp
        rows = win[pl.ds(roff, T), :].astype(jnp.float32)
        rows_m1 = win[pl.ds(roff - 1, T), :].astype(jnp.float32)
        rows_p1 = win[pl.ds(roff + 1, T), :].astype(jnp.float32)
        tE, tO = rows[:, :C], rows[:, C:]
        w_m1 = wdw_ref[dy + 1, 0, :].astype(jnp.float32)
        w_0 = wdw_ref[dy + 1, 1, :].astype(jnp.float32)
        w_p1 = wdw_ref[dy + 1, 2, :].astype(jnp.float32)
        eterm = (jnp.where(mE, rows_m1[:, C:], 0.0) * w_m1
                 + tE * w_0 + tO * w_p1)
        oterm = (tE * w_m1 + tO * w_0
                 + jnp.where(mO, rows_p1[:, :C], 0.0) * w_p1)
        if dy == -1:
            hm = h_row > 0
        elif dy == 1:
            hm = h_row < H - 1
        else:
            hm = None
        if hm is not None:
            eterm = jnp.where(hm, eterm, 0.0)
            oterm = jnp.where(hm, oterm, 0.0)
        accE = accE + eterm
        accO = accO + oterm

    b = bdw_ref[0].astype(jnp.float32)
    yE = _act(accE + b)
    yO = _act(accO + b)

    outE = jnp.dot(yE.astype(wpw_ref.dtype), wpw_ref[:],
                   preferred_element_type=jnp.float32)
    outO = jnp.dot(yO.astype(wpw_ref.dtype), wpw_ref[:],
                   preferred_element_type=jnp.float32)
    if use_noise:
        nz = nz_ref[:].astype(jnp.float32)
        outE = outE + nz[:, 0:1]
        outO = outO + nz[:, 1:2]
    if final_act:
        outE = _act(outE)
        outO = _act(outO)
    if flat_out:
        # interleave phases back to flat rows: [T, 2, O] -> [2T, O]
        O = outE.shape[-1]
        out = jnp.stack([outE, outO], axis=1).reshape(2 * T, O)
    else:
        out = jnp.concatenate([outE, outO], axis=1)
    out_ref[:] = out.astype(out_ref.dtype)


def _xla_packed(x2d, N, H, W, w_dw, b_dw, w_pw, noise, final_act=True):
    """Oracle/fallback: unpack -> XLA sepconv -> repack."""
    from ...ops import conv2d
    from .sepconv import _act

    C = w_dw.shape[-1]
    if w_dw.ndim == 3:
        w_dw4 = w_dw[:, :, None, :]
    else:
        w_dw4 = w_dw
    if w_pw.ndim == 2:
        w_pw4 = w_pw[None, None]
    else:
        w_pw4 = w_pw
    x = x2d.reshape(N, H, W, C)
    y = _act(conv2d(x, w_dw4, padding=1, groups=C) + b_dw.astype(x.dtype))
    y = conv2d(y, w_pw4)
    if noise is not None:
        y = y + noise.astype(x.dtype)[None, :, :, None]
    if final_act:
        y = _act(y)
    O = y.shape[-1]
    return y.reshape(N * H * (W // 2), 2 * O)


@functools.partial(jax.jit,
                   static_argnames=("N", "H", "W", "interpret", "tile_rows",
                                    "final_act", "flat_out"))
def fused_block_packed(x2d: jnp.ndarray, N: int, H: int, W: int,
                       w_dw: jnp.ndarray, b_dw: jnp.ndarray,
                       w_pw: jnp.ndarray,
                       noise: Optional[jnp.ndarray] = None,
                       interpret: bool = False,
                       tile_rows: int = 16,
                       final_act: bool = True,
                       flat_out: bool = False) -> jnp.ndarray:
    """Fused dw3x3+b -> act -> pw1x1 (+noise) -> act, w-packed in and out.

    Args:
        x2d: [N*H*(W/2), 2*C] packed view of an [N, H, W, C] activation.
        N/H/W: the logical NHWC geometry (static).
        w_dw: [3,3,1,C] (or [3,3,C]) depthwise weights; b_dw: [C].
        w_pw: [1,1,C,O] (or [C,O]) pointwise weights (O % 128 == 0).
        noise: optional [H, W] per-pixel additive scalar (pre-scaled),
            added after the pointwise conv (broadcast over batch/channels).
        tile_rows: image rows per grid step (auto-shrunk to the VMEM budget).
        final_act: apply the model activation after the pointwise conv
            (False when the caller resamples before the activation, e.g. a
            synthesis conv1 whose act runs after the upsample).
        flat_out: return the flat [N*H*W, O] view instead of packed (the
            phase interleave runs in the kernel's VMEM store).

    Returns [N*H*(W/2), 2*O] packed, or [N*H*W, O] when flat_out.
    """
    if w_dw.ndim == 4:
        w_dw = w_dw[:, :, 0, :]
    if w_pw.ndim == 4:
        w_pw = w_pw[0, 0]
    C = w_dw.shape[-1]
    O = w_pw.shape[-1]
    Wp = W // 2
    RP = N * H * Wp
    Rp_img = H * Wp
    assert x2d.shape == (RP, 2 * C), (x2d.shape, RP, C)

    eligible = (C % 128 == 0 and O % 128 == 0 and Wp % 8 == 0 and W % 2 == 0)
    if eligible:
        T = tile_rows * Wp
        M = Wp + 8
        itemsize = x2d.dtype.itemsize

        def vmem(T_):
            return itemsize * (
                2 * (T_ + 4 * M) * 2 * C       # x window (dbuf)
                + 2 * T_ * 2 * O)              # out (pipelined)

        def stack(T_):
            # Mosaic keeps the kernel body's f32 temporaries on a scoped
            # VMEM stack (16 MB limit, separate from scratch): ~3.5
            # full-width [T, 2C] f32 live values measured empirically
            # (T=4096/C=128 fits, T=1024/C=512 does not).
            return int(3.5 * 4 * T_ * 2 * C)

        budget = 12 * 1024 * 1024
        while T > Wp and (vmem(T) > budget
                          or stack(T) > 14_500_000):
            T //= 2
        # tiles divide images (noise window reuse + aligned seams); windows
        # must fit the array; interior tiles must never clip.
        if T % Wp or Rp_img % T or T < M or T + 2 * M > RP:
            eligible = False

    if not eligible:
        y = _xla_packed(x2d, N, H, W, w_dw, b_dw, w_pw, noise,
                        final_act=final_act)
        return y.reshape(N * H * W, O) if flat_out else y

    use_noise = noise is not None
    nh_blocks = Rp_img // T
    if noise is None:
        nz = jnp.zeros((Rp_img, 2), x2d.dtype)
    else:
        nz = noise.reshape(Rp_img, 2).astype(x2d.dtype)

    kernel = functools.partial(_kernel, T=T, Wp=Wp, H=H, RP=RP,
                               use_noise=use_noise, final_act=final_act,
                               flat_out=flat_out)
    out2d = pl.pallas_call(
        kernel,
        grid=(RP // T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # x (HBM)
            pl.BlockSpec((3, 3, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, O), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 2), lambda i: (i % nh_blocks, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((2 * T, O), lambda i: (i, 0),
                                memory_space=pltpu.VMEM) if flat_out else
                   pl.BlockSpec((T, 2 * O), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((2 * RP, O), x2d.dtype)
                   if flat_out else
                   jax.ShapeDtypeStruct((RP, 2 * O), x2d.dtype)),
        scratch_shapes=[
            pltpu.VMEM((2, T + 4 * M, 2 * C), x2d.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x2d, w_dw.astype(x2d.dtype), b_dw.reshape(1, C).astype(x2d.dtype),
      w_pw.astype(x2d.dtype), nz)
    return out2d


def blockdiag2(w: jnp.ndarray) -> jnp.ndarray:
    """[I, O] -> [[w, 0], [0, w]] of shape [2I, 2O] — the weight transform
    that makes a pointwise conv act per-phase on packed rows."""
    if w.ndim == 4:
        w = w[0, 0]
    i, o = w.shape
    z = jnp.zeros((i, o), w.dtype)
    return jnp.concatenate([
        jnp.concatenate([w, z], axis=1),
        jnp.concatenate([z, w], axis=1),
    ], axis=0)
