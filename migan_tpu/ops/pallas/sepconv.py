"""Fused SeparableConv2d body as a Pallas TPU kernel.

The MI-GAN inference net is HBM-bandwidth-bound (measured ~75% of v5e HBM BW
at ~5% MXU utilization): every SeparableConv2d costs four full activation
passes in the XLA path (depthwise read/write + pointwise read/write). This
kernel fuses

    depthwise 3x3 (+bias) -> lrelu_agc -> pointwise 1x1 [-> +noise]
    -> lrelu_agc

into ONE pass: each tile of the input is DMA'd to VMEM once, the 3x3 stencil
runs on the VPU as 9 statically-offset multiply-adds, the 1x1 projection is
a single [tile, C] x [C, O] MXU matmul, and only the result returns to HBM —
halving sep-conv traffic.

Layout: activations are viewed as a flat 2-D [N*H*W, C] row stream (a free
reshape of contiguous NHWC; the remote Mosaic toolchain rejects >2-D HBM
slicing, and 2-D keeps every DMA expressible). A 3x3 tap at (dy, dx) is a
row offset of dy*W + dx, so each tap is a *static* slice of the tile's
scratch window. Image borders:

  - array ends: the scratch window has a zeroed margin of M = W+1 rows on
    each side; the DMA lands at a dynamic offset so out-of-array taps read
    zeros (XLA-pad semantics) with no masking or branches;
  - row/image seams (w = 0 / W-1, h = 0 / H-1, batch boundaries): masked
    per-tap with iota-derived column/row ids.

Equivalent XLA composition (the correctness oracle in tests):
    conv2d(x, w_dw, padding=1, groups=C) + b -> act
    -> conv2d(., w_pw) [+ noise] -> act
(reference semantics: lib/model_zoo/migan_inference.py:154-170 with
down=1, up=1).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT2 = math.sqrt(2.0)
_ALPHA = 0.2
_CLAMP = 256.0


def _act(x):
    """lrelu_agc(alpha=0.2, gain=sqrt_2, clamp=256) — the model's single
    activation (reference migan_inference.py:7-28)."""
    x = jnp.where(x >= 0, x, x * _ALPHA)
    x = x * _SQRT2
    return jnp.clip(x, -_CLAMP, _CLAMP)


def _dma_for(x_hbm, scratch, sem, slot, j, *, M, SZ, tile, NHW):
    """Async copy of tile j's window into scratch slot."""
    lo = j * tile - M
    src = pl.multiple_of(jnp.clip(lo, 0, NHW - SZ), 8)
    # scratch[slot, p] corresponds to x[lo - M + p]; the DMA lands at
    # dst = (src - lo) + M in [0, 2M], so clipped windows shift into the
    # zeroed margins and out-of-array taps read zeros.
    dst = pl.multiple_of(src - lo + M, 8)
    return pltpu.make_async_copy(
        x_hbm.at[pl.ds(src, SZ)], scratch.at[slot].at[pl.ds(dst, SZ)],
        sem.at[slot])


def _kernel(*refs, tile: int, H: int, W: int, NHW: int, use_noise: bool,
            has_skip: bool, has_pre: bool, packed_out: bool,
            pre_g: int = 0):
    # positional refs layout (inputs, then out, then scratch):
    #   x_hbm, [skip_hbm], [wpre, bpre], wdw, bdw, wpw, noise,
    #   out_ref, x_scratch, x_sem, [s_scratch, s_sem]
    # pre_g > 0: "wide prologue" — x_hbm is the [NHW/G, G*Cin=128] byte
    # view of the small-Cin input; the pointwise prologue runs as one
    # [*, 128] @ [128, G*C] matmul (wpre = kron(I_G, w_pre)) followed by a
    # lane->sublane reshape whose groups are 128-aligned (Mosaic-legal).
    it = iter(refs)
    x_hbm = next(it)
    skip_hbm = next(it) if has_skip else None
    wpre_ref = next(it) if has_pre else None
    bpre_ref = next(it) if has_pre else None
    wdw_ref = next(it)
    bdw_ref = next(it)
    wpw_ref = next(it)
    noise_ref = next(it)
    out_ref = next(it)
    scratch = next(it)
    sem = next(it)
    s_scratch = next(it) if has_skip else None
    s_sem = next(it) if has_skip else None

    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    # Margin rounded up to the sublane tiling (8) — Mosaic requires DMA
    # slice shapes/offsets aligned to it; the round-up also keeps every
    # tap slice start static. Wide-prologue mode rounds to 8*G so offsets
    # stay aligned in wide-row units too.
    if pre_g:
        M = ((W + 1 + 8 * pre_g - 1) // (8 * pre_g)) * (8 * pre_g)
    else:
        M = ((W + 1 + 7) // 8) * 8
    SZ = tile + 2 * M          # rows needed: [base - M, base + tile + M)
    base = i * tile
    g = pre_g if pre_g else 1
    dma = lambda slot, j: _dma_for(x_hbm, scratch, sem, slot, j, M=M // g,
                                   SZ=SZ // g, tile=tile // g, NHW=NHW // g)
    if has_skip:
        sdma = lambda slot, j: _dma_for(skip_hbm, s_scratch, s_sem, slot, j,
                                        M=M, SZ=SZ, tile=tile, NHW=NHW)

    # Margins only matter for the first/last tiles (interior DMAs cover the
    # full tap range); zero them once there instead of memsetting 2MB/tile.
    @pl.when(i == 0)
    def _():
        z = jnp.zeros((2 * M // g, scratch.shape[-1]), scratch.dtype)
        scratch[0, 0:2 * M // g] = z
        dma(0, 0).start()
        if has_skip:
            s_scratch[0, 0:2 * M] = z
            sdma(0, 0).start()

    @pl.when(i == n_tiles - 1)
    def _():
        slot = i % 2
        z = jnp.zeros((2 * M // g, scratch.shape[-1]), scratch.dtype)
        scratch[slot, (tile + 2 * M) // g:(tile + 4 * M) // g] = z
        if has_skip:
            s_scratch[slot, tile + 2 * M:tile + 4 * M] = z

    # double buffering: issue tile i+1's DMA before computing tile i
    @pl.when(i + 1 < n_tiles)
    def _():
        dma((i + 1) % 2, i + 1).start()
        if has_skip:
            sdma((i + 1) % 2, i + 1).start()

    dma(i % 2, i).wait()
    if has_skip:
        sdma(i % 2, i).wait()
    window = scratch.at[i % 2]

    C_out_dw = wdw_ref.shape[-1]
    ids = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) + base
    col = jax.lax.rem(ids, W)
    h = jax.lax.rem(jax.lax.div(ids, W), H)

    # Optional fused prologue on the needed span [M, 3M + tile):
    #   z = x (+ skip) [-> act(pw_pre + b_pre)]
    z_span = None
    if pre_g:
        span_w = window[M // g:(3 * M + tile) // g, :]
        y = jnp.dot(span_w.astype(wpre_ref.dtype), wpre_ref[:],
                    preferred_element_type=jnp.float32)
        C_pre = wpre_ref.shape[-1] // g
        y = y.reshape((tile + 2 * M), C_pre)
        z_span = _act(y + bpre_ref[0].astype(jnp.float32))
    elif has_skip or has_pre:
        span = window[M:3 * M + tile, :]
        if has_skip:
            span = span + s_scratch.at[i % 2][M:3 * M + tile, :]
        if has_pre:
            span = jnp.dot(span.astype(wpre_ref.dtype), wpre_ref[:],
                           preferred_element_type=jnp.float32)
            span = _act(span + bpre_ref[0].astype(jnp.float32))
        z_span = span.astype(jnp.float32)

    # Masks hoisted: the w-seam selects apply once per source column (not
    # per (dy, dx) tap) and the h-seam select once per dy on the combined
    # 3-tap term. Tap math stays f32: a bf16-taps variant measured 4x
    # SLOWER (73 GB/s) — Mosaic's (2,1)-packed bf16 layout makes the
    # sublane-shifted +-1 slices pathological, while f32 shifts are plain
    # sublane rotates.
    m_l = col > 0
    m_r = col < W - 1
    acc = jnp.zeros((tile, C_out_dw), jnp.float32)
    for dy in (-1, 0, 1):
        start = 2 * M + dy * W  # static
        if z_span is not None:
            rows = z_span[start - M:start - M + tile, :]
            rows_l = z_span[start - M - 1:start - M - 1 + tile, :]
            rows_r = z_span[start - M + 1:start - M + 1 + tile, :]
        else:
            rows = window[start:start + tile, :].astype(jnp.float32)
            rows_l = window[start - 1:start - 1 + tile, :].astype(jnp.float32)
            rows_r = window[start + 1:start + 1 + tile, :].astype(jnp.float32)
        w_l = wdw_ref[dy + 1, 0, :].astype(jnp.float32)
        w_c = wdw_ref[dy + 1, 1, :].astype(jnp.float32)
        w_r = wdw_ref[dy + 1, 2, :].astype(jnp.float32)
        term = (jnp.where(m_l, rows_l, 0.0) * w_l + rows * w_c
                + jnp.where(m_r, rows_r, 0.0) * w_r)
        if dy == -1:
            term = jnp.where(h > 0, term, 0.0)
        elif dy == 1:
            term = jnp.where(h < H - 1, term, 0.0)
        acc += term

    acc += bdw_ref[0].astype(jnp.float32)
    acc = _act(acc)

    out = jnp.dot(acc.astype(wpw_ref.dtype), wpw_ref[:],
                  preferred_element_type=jnp.float32)
    if use_noise:
        out = out + noise_ref[:].astype(jnp.float32)
    out = _act(out).astype(out_ref.dtype)
    if packed_out:
        # flat [tile, O] -> w-packed [tile/2, 2O]: an in-VMEM relayout,
        # replacing the full HBM round-trip XLA pays for the same reshape
        out = out.reshape(tile // 2, 2 * out.shape[-1])
    out_ref[:] = out


def _xla_sepconv(x, w_dw, b_dw, w_pw, noise):
    """Unfused reference composition (also the small-shape fallback)."""
    from ...ops import conv2d

    C = x.shape[-1]
    if w_dw.ndim == 3:
        w_dw = w_dw[:, :, None, :]
    if w_pw.ndim == 2:
        w_pw = w_pw[None, None]
    y = conv2d(x, w_dw, padding=1, groups=C) + b_dw.astype(x.dtype)
    y = _act(y)
    y = conv2d(y, w_pw)
    if noise is not None:
        y = y + noise.astype(x.dtype)[None, :, :, None]
    return _act(y)


def _xla_block(x, w_dw, b_dw, w_pw, noise, skip, w_pre, b_pre):
    """Unfused composition of the full fused-block semantics (oracle +
    small-shape fallback)."""
    if skip is not None:
        x = x + skip
    if w_pre is not None:
        from ...ops import conv2d

        if w_pre.ndim == 2:
            w_pre = w_pre[None, None]
        x = _act(conv2d(x, w_pre) + b_pre.astype(x.dtype))
    return _xla_sepconv(x, w_dw, b_dw, w_pw, noise)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "packed_out", "tile_hint"))
def fused_block(x: jnp.ndarray, w_dw: jnp.ndarray, b_dw: jnp.ndarray,
                w_pw: jnp.ndarray,
                noise: Optional[jnp.ndarray] = None,
                skip: Optional[jnp.ndarray] = None,
                w_pre: Optional[jnp.ndarray] = None,
                b_pre: Optional[jnp.ndarray] = None,
                interpret: bool = False,
                packed_out: bool = False,
                tile_hint: int = 0) -> jnp.ndarray:
    """Fused [(+skip) -> (pw_pre+b -> act) -> dw3x3+b -> act -> pw1x1
    (+noise) -> act], NHWC — one HBM pass for a whole sub-block.

    Args:
        x: [N, H, W, Cin].
        skip: optional [N, H, W, Cin] added to x first (skip connection).
        w_pre/b_pre: optional fused pointwise prologue [Cin, C] / [C]
            (e.g. fromrgb), with the model activation applied.
        w_dw: [3, 3, 1, C] HWIO depthwise weights (or [3, 3, C]).
        b_dw: [C] depthwise bias.
        w_pw: [1, 1, C, O] HWIO pointwise weights (or [C, O]).
        noise: optional [H, W] additive per-pixel scalar (already scaled by
            noise_strength), broadcast over batch and channels.
        packed_out: return the w-packed [N*H*(W/2), 2O] 2-D view instead of
            NHWC — the relayout runs inside the kernel's VMEM store, saving
            the HBM round-trip XLA pays for the same reshape.

    Returns [N, H, W, O], or [N*H*(W/2), 2O] when packed_out.
    """
    N, H, W, Cin = x.shape
    if w_dw.ndim == 4:
        w_dw = w_dw[:, :, 0, :]
    if w_pw.ndim == 4:
        w_pw = w_pw[0, 0]
    if w_pre is not None and w_pre.ndim == 4:
        w_pre = w_pre[0, 0]
    C = w_dw.shape[-1]
    O = w_pw.shape[-1]
    has_skip = skip is not None
    has_pre = w_pre is not None

    HW = H * W
    NHW = N * HW
    # Wide prologue: a small-Cin input (e.g. the 8-ch folded rgb+mask) is
    # DMA'd through its free [NHW/G, 128] byte view; the prologue matmul
    # runs with kron(I_G, w_pre) weights. Avoids both the Cin=128 DMA gate
    # and an XLA pass materializing the prologue output.
    pre_wide = (has_pre and not has_skip and Cin < 128 and 128 % Cin == 0)
    G = 128 // Cin if pre_wide else 1
    if pre_wide:
        M = ((W + 1 + 8 * G - 1) // (8 * G)) * (8 * G)
    else:
        M = ((W + 1 + 7) // 8) * 8
    # tile: divides H*W, at least W+2, bounded by a VMEM window budget
    # (the budget covers every double-buffered window)
    if tile_hint:
        tile = tile_hint
    else:
        tile = HW
        budget = 2 * 1024 * 1024 // (2 if has_skip else 1)

        def stack(T_):
            # Mosaic's scoped-VMEM stack (16 MB limit) holds the body's
            # f32 temporaries: ~4 full-width [T, C] live values for the dw
            # taps, plus the prologue's [T + 2M, C] z_span (and its
            # pre-activation copy) when present.
            sz = 4 * 4 * T_ * C
            if has_pre or has_skip:
                sz += 2 * 4 * (T_ + 2 * M) * C
            return sz

        while (tile > 2 * W
               and ((tile + 4 * M) * Cin * x.dtype.itemsize > budget
                    or tile + 2 * M > NHW
                    or stack(tile) > 14_000_000)):
            tile //= 2
    assert HW % tile == 0 and NHW % tile == 0

    if (tile + 2 * M > NHW or tile % 8 or W % 8
            or (Cin % 128 if not pre_wide else
                (tile % (8 * G) or NHW % G))
            or (packed_out and (tile % 16 or W % 2))):
        # array too small / lanes or sublanes unaligned — XLA path
        # (Cin must fill 128 lanes for HBM DMA slicing; the batch-folded
        # model path provides that at the C=64 stage, models/migan_fold.py)
        y = _xla_block(x, w_dw, b_dw, w_pw, noise, skip, w_pre, b_pre)
        if packed_out:
            y = y.reshape(NHW // 2, 2 * O)
        return y

    use_noise = noise is not None
    if noise is None:
        noise_flat = jnp.zeros((HW, 1), x.dtype)
    else:
        noise_flat = noise.reshape(HW, 1).astype(x.dtype)

    kernel = functools.partial(_kernel, tile=tile, H=H, W=W, NHW=NHW,
                               use_noise=use_noise, has_skip=has_skip,
                               has_pre=has_pre, packed_out=packed_out,
                               pre_g=G if pre_wide else 0)
    nh_blocks = HW // tile

    if pre_wide:
        args = [x.reshape(NHW // G, 128)]
    else:
        args = [x.reshape(NHW, Cin)]
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]   # x stays in HBM
    if has_skip:
        args.append(skip.reshape(NHW, Cin))
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    if has_pre:
        if pre_wide:
            wp = jnp.kron(jnp.eye(G, dtype=w_pre.dtype), w_pre)
            args += [wp.astype(x.dtype), b_pre.reshape(1, C).astype(x.dtype)]
            in_specs += [
                pl.BlockSpec((128, G * C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ]
        else:
            args += [w_pre.astype(x.dtype),
                     b_pre.reshape(1, C).astype(x.dtype)]
            in_specs += [
                pl.BlockSpec((Cin, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ]
    args += [w_dw.astype(x.dtype), b_dw.reshape(1, C).astype(x.dtype),
             w_pw.astype(x.dtype), noise_flat]
    in_specs += [
        pl.BlockSpec((3, 3, C), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((C, O), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 1), lambda i: (i % nh_blocks, 0),
                     memory_space=pltpu.VMEM),
    ]
    scratch_shapes = [
        (pltpu.VMEM((2, (tile + 4 * M) // G, 128), x.dtype) if pre_wide
         else pltpu.VMEM((2, tile + 4 * M, Cin), x.dtype)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if has_skip:
        scratch_shapes += [
            pltpu.VMEM((2, tile + 4 * M, Cin), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]

    if packed_out:
        out_specs = pl.BlockSpec((tile // 2, 2 * O), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((NHW // 2, 2 * O), x.dtype)
    else:
        out_specs = pl.BlockSpec((tile, O), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((NHW, O), x.dtype)
    out2d = pl.pallas_call(
        kernel,
        grid=(NHW // tile,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*args)
    return out2d if packed_out else out2d.reshape(N, H, W, O)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_sepconv(x: jnp.ndarray, w_dw: jnp.ndarray, b_dw: jnp.ndarray,
                  w_pw: jnp.ndarray,
                  noise: Optional[jnp.ndarray] = None,
                  interpret: bool = False) -> jnp.ndarray:
    """Fused [dw3x3+b -> act -> pw1x1 (+noise) -> act] (fused_block without
    prologue)."""
    return fused_block(x, w_dw, b_dw, w_pw, noise=noise,
                       interpret=interpret)
