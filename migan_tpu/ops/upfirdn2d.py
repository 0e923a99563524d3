"""Fused pad -> zero-insert-upsample -> FIR-filter -> downsample for NHWC batches.

TPU-native equivalent of the reference CUDA kernel
(reference: torch_utils/ops/upfirdn2d.cu, python wrapper upfirdn2d.py:120-268).
Instead of ~50 hand-tiled CUDA template kernels, the whole operation is ONE
`lax.conv_general_dilated`:

  - zero-insert upsample == ``lhs_dilation``
  - pad / crop           == (possibly negative) convolution padding
  - FIR filter           == depthwise filter via ``feature_group_count``
  - downsample           == ``window_strides``

XLA lowers this onto the TPU MXU/VPU directly and fuses neighbouring
element-wise ops; there is no analog of the reference's JIT plugin builder
(reference: torch_utils/custom_ops.py) because XLA *is* the JIT.

Numerics match `_upfirdn2d_ref` (reference: torch_utils/ops/upfirdn2d.py:169-208)
including the trailing zero rows/cols of zero-insert upsampling (lhs_dilation
produces (H-1)*up+1 rows; the reference produces H*up, so we add ``up - 1`` to
the high padding) and are differentiable to arbitrary order (XLA convs have
well-defined transposes, so no hand-written double-backward like
reference conv2d_gradfix.py is needed).

Layout note: all image tensors in this framework are NHWC (TPU-native lane
dim = channels); the reference is NCHW.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .filters import parse_padding, parse_scaling, filter_size

# Default conv precision. HIGHEST keeps f32 inputs at true f32 accuracy
# (needed for <1% FID parity); bf16 inputs hit the MXU natively either way.
DEFAULT_PRECISION = lax.Precision.HIGHEST


def _depthwise_kernel(f: jnp.ndarray, channels: int, dtype) -> jnp.ndarray:
    """Tile a [fh, fw] filter into an HWIO depthwise kernel [fh, fw, 1, C]."""
    return jnp.tile(f[:, :, None, None].astype(dtype), (1, 1, 1, channels))


def upfirdn2d(
    x: jnp.ndarray,
    f: jnp.ndarray | None,
    up=1,
    down=1,
    padding=0,
    flip_filter: bool = False,
    gain: float = 1.0,
    precision=None,
) -> jnp.ndarray:
    """Pad, upsample, filter, and downsample a batch of NHWC images.

    Args:
        x: [N, H, W, C] input.
        f: prepared FIR filter (see :func:`filters.setup_filter`) of shape
           [fh, fw], separable [taps], or None (identity).
        up / down: int or (x, y) integer resampling factors.
        padding: int, (x, y), or (x0, x1, y0, y1) pad *in upsampled space*;
           negative = crop.
        flip_filter: False = convolution, True = correlation.
        gain: output magnitude scale.

    Returns:
        [N, outH, outW, C] where
        outH = (H*upy + pady0 + pady1 - fh) // downy + 1 (same for W).
    """
    assert x.ndim == 4, f"expected NHWC, got shape {x.shape}"
    if f is None:
        f = jnp.ones((1, 1), dtype=jnp.float32)
    assert f.ndim in (1, 2)
    upx, upy = parse_scaling(up)
    downx, downy = parse_scaling(down)
    px0, px1, py0, py1 = parse_padding(padding)
    precision = DEFAULT_PRECISION if precision is None else precision
    C = x.shape[-1]

    if f.ndim == 1:
        # Separable: x-direction pass then y-direction pass, sqrt(gain) each
        # (mirrors reference upfirdn2d.py:237-240).
        fx = f * (float(gain) ** 0.5)
        fy = f * (float(gain) ** 0.5)
        if not flip_filter:
            fx = jnp.flip(fx)
            fy = jnp.flip(fy)
        wx = _depthwise_kernel(fx[None, :], C, x.dtype)  # [1, fw, 1, C]
        wy = _depthwise_kernel(fy[:, None], C, x.dtype)  # [fh, 1, 1, C]
        x = lax.conv_general_dilated(
            x, wx,
            window_strides=(1, downx),
            padding=((0, 0), (px0, px1 + upx - 1)),
            lhs_dilation=(1, upx),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
            precision=precision,
        )
        return lax.conv_general_dilated(
            x, wy,
            window_strides=(downy, 1),
            padding=((py0, py1 + upy - 1), (0, 0)),
            lhs_dilation=(upy, 1),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
            precision=precision,
        )

    ff = f * (float(gain) ** 1.0)
    if not flip_filter:
        ff = jnp.flip(ff, axis=(0, 1))
    w = _depthwise_kernel(ff, C, x.dtype)
    return lax.conv_general_dilated(
        x, w,
        window_strides=(downy, downx),
        padding=((py0, py1 + upy - 1), (px0, px1 + upx - 1)),
        lhs_dilation=(upy, upx),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
        precision=precision,
    )


def filter2d(x, f, padding=0, flip_filter=False, gain=1.0, precision=None):
    """FIR-filter NHWC images; output padded to match input shape by default.

    Padding arithmetic matches reference upfirdn2d.py:296-304.
    """
    px0, px1, py0, py1 = parse_padding(padding)
    fw, fh = filter_size(f)
    p = [
        px0 + fw // 2,
        px1 + (fw - 1) // 2,
        py0 + fh // 2,
        py1 + (fh - 1) // 2,
    ]
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain,
                     precision=precision)


def upsample2d(x, f, up=2, padding=0, flip_filter=False, gain=1.0,
               precision=None):
    """Upsample NHWC images with an FIR filter.

    Padding/gain arithmetic matches reference upfirdn2d.py:334-343
    (gain is multiplied by up*up to preserve DC magnitude).
    """
    upx, upy = parse_scaling(up)
    px0, px1, py0, py1 = parse_padding(padding)
    fw, fh = filter_size(f)
    p = [
        px0 + (fw + upx - 1) // 2,
        px1 + (fw - upx) // 2,
        py0 + (fh + upy - 1) // 2,
        py1 + (fh - upy) // 2,
    ]
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter,
                     gain=gain * upx * upy, precision=precision)


def downsample2d(x, f, down=2, padding=0, flip_filter=False, gain=1.0,
                 precision=None):
    """Downsample NHWC images with an FIR filter.

    Padding arithmetic matches reference upfirdn2d.py:373-382.
    """
    downx, downy = parse_scaling(down)
    px0, px1, py0, py1 = parse_padding(padding)
    fw, fh = filter_size(f)
    p = [
        px0 + (fw - downx + 1) // 2,
        px1 + (fw - downx) // 2,
        py0 + (fh - downy + 1) // 2,
        py1 + (fh - downy) // 2,
    ]
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter,
                     gain=gain, precision=precision)
