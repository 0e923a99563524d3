"""2D convolution with fused up/downsampling — the single conv primitive of
all training-time networks.

TPU-native equivalent of reference torch_utils/ops/conv2d_resample.py:59-154.
The reference needs five hand-picked cuDNN fast paths; on TPU every path is a
`lax.conv_general_dilated`, so only two orderings matter for FLOPs:

  - down>1: FIR first (full res, cheap depthwise), then k-conv *strided* so the
    MXU conv only computes kept positions (reference fast path :119-122).
  - up>1 with a 1x1 kernel: conv first at low res, then FIR-upsample
    (reference fast path :113-116) — this is MI-GAN's hot upsample layer.
  - generic up: zero-insert+FIR via lhs_dilation, then conv (reference
    fallback :150-154; equivalent by associativity of valid convolution).

No conv2d_gradfix analog is needed: XLA convs are differentiable to arbitrary
order under jax.grad, which is what R1 regularization requires
(reference: torch_utils/ops/conv2d_gradfix.py:35-168).

Layouts: activations NHWC, weights HWIO with I = in_channels // groups.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .filters import parse_padding, filter_size
from .upfirdn2d import upfirdn2d, DEFAULT_PRECISION


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    stride=1,
    padding=0,
    groups: int = 1,
    flip_weight: bool = True,
    precision=None,
) -> jnp.ndarray:
    """Plain grouped 2D conv, NHWC x HWIO -> NHWC.

    ``flip_weight=True`` = correlation (the torch/lax native op),
    ``flip_weight=False`` = true convolution (spatially flipped weights);
    matches reference conv2d_resample.py:29-54 conventions.
    """
    assert x.ndim == 4 and w.ndim == 4
    if not flip_weight:
        w = jnp.flip(w, axis=(0, 1))
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    elif len(padding) == 2 and isinstance(padding[0], int):
        padding = ((padding[0], padding[0]), (padding[1], padding[1]))
    precision = DEFAULT_PRECISION if precision is None else precision
    return lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision=precision,
    )


def conv2d_resample(
    x: jnp.ndarray,
    w: jnp.ndarray,
    f: jnp.ndarray | None = None,
    up: int = 1,
    down: int = 1,
    padding=0,
    groups: int = 1,
    flip_weight: bool = True,
    flip_filter: bool = False,
    precision=None,
) -> jnp.ndarray:
    """Conv with optional FIR-filtered up/downsampling.

    Args mirror reference conv2d_resample.py:59 (NHWC/HWIO layouts instead of
    NCHW/OIHW). ``padding`` is with respect to the upsampled image.
    """
    assert isinstance(up, int) and up >= 1
    assert isinstance(down, int) and down >= 1
    kh, kw = int(w.shape[0]), int(w.shape[1])
    fw, fh = filter_size(f)
    px0, px1, py0, py1 = parse_padding(padding)

    # Padding adjustments for resampling (reference conv2d_resample.py:94-104).
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    # 1x1 conv + upsample: convolve at low res first, then FIR-upsample.
    if kw == 1 and kh == 1 and up > 1 and down == 1:
        x = conv2d(x, w, groups=groups, flip_weight=flip_weight,
                   precision=precision)
        return upfirdn2d(x, f, up=up, padding=[px0, px1, py0, py1],
                         gain=up ** 2, flip_filter=flip_filter,
                         precision=precision)

    # Downsample: FIR at full res, then strided conv computes only kept pixels.
    if down > 1 and up == 1:
        x = upfirdn2d(x, f, padding=[px0, px1, py0, py1],
                      flip_filter=flip_filter, precision=precision)
        return conv2d(x, w, stride=down, groups=groups,
                      flip_weight=flip_weight, precision=precision)

    # No resampling: one conv with (possibly asymmetric/negative) padding.
    if up == 1 and down == 1:
        return conv2d(x, w, padding=((py0, py1), (px0, px1)), groups=groups,
                      flip_weight=flip_weight, precision=precision)

    # Generic up (optionally + down): zero-insert + FIR, conv, FIR-down.
    x = upfirdn2d(x, f if up > 1 else None, up=up,
                  padding=[px0, px1, py0, py1], gain=up ** 2,
                  flip_filter=flip_filter, precision=precision)
    x = conv2d(x, w, groups=groups, flip_weight=flip_weight,
               precision=precision)
    if down > 1:
        x = upfirdn2d(x, f, down=down, flip_filter=flip_filter,
                      precision=precision)
    return x


def pw_up2_phase(x: jnp.ndarray, w_pw: jnp.ndarray, *, packed: bool = False,
                 precision=None) -> jnp.ndarray:
    """Pointwise conv with a FOLDED [1,3,3,1] up2-FIR: 4 phase-weighted
    2x2 convs on the MXU instead of conv + depthwise FIR stencil on the
    VPU.

    The algebra is the reference's conv-then-filter fast path run in
    reverse (reference torch_utils/ops/conv2d_resample.py:113-116 merges
    a 1x1 conv with the up-filter; here the merged operator is expressed
    as stride-1 convs per output phase so the MXU does all arithmetic):
    up2-FIR output (2j+ph, 2p+pw) touches exactly 2x2 low-res pixels with
    per-axis taps (0.25, 0.75) for even and (0.75, 0.25) for odd phases
    (ops/upfirdn2d semantics with gain=4, zero-clipped at image edges —
    reproduced by the convs' zero padding). Note the fold is 16x the
    pointwise MACs — whether MXU idle capacity absorbs that is a
    measured question (scripts/bench_fir_fold.py).

    x: [N, H, W, Ci] -> [N, H, W, 4*Co]; channel group (ph*2 + pw)*Co + c
    holds up-phase (ph, pw) — the layout fused_up_block(phase_input=True)
    consumes.

    packed=True: one 3x3 conv with 4*Co outputs (phase kernels zero-padded
    into the common support) — 2.25x the MACs of the 4-conv form but a
    single fused MXU op with no channel-concat relayout.
    """
    if w_pw.ndim == 4:
        w_pw = w_pw[0, 0]
    ci, co = w_pw.shape
    precision = DEFAULT_PRECISION if precision is None else precision
    taps = ((jnp.asarray([0.25, 0.75]), (1, 0)),     # even phase: j-1, j
            (jnp.asarray([0.75, 0.25]), (0, 1)))    # odd phase:  j, j+1
    w = w_pw.astype(x.dtype)
    if packed:
        k = jnp.zeros((3, 3, ci, 4 * co), x.dtype)
        for ph in (0, 1):
            fy = jnp.asarray([0.25, 0.75, 0.0] if ph == 0
                             else [0.0, 0.75, 0.25])
            for pw_ in (0, 1):
                fx = jnp.asarray([0.25, 0.75, 0.0] if pw_ == 0
                                 else [0.0, 0.75, 0.25])
                g = (ph * 2 + pw_) * co
                k = k.at[:, :, :, g:g + co].set(
                    (fy[:, None, None, None] * fx[None, :, None, None]
                     ).astype(x.dtype) * w[None, None])
        return lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
    outs = []
    for fy, py in taps:
        for fx, px in taps:
            k = (fy[:, None, None, None] * fx[None, :, None, None]
                 ).astype(x.dtype) * w[None, None]          # [2,2,Ci,Co]
            outs.append(lax.conv_general_dilated(
                x, k, (1, 1), (py, px),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=precision))
    return jnp.concatenate(outs, axis=-1)
