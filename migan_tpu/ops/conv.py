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
