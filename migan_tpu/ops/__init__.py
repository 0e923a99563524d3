"""TPU-native op layer: resampling, fused bias/activation, resampling convs.

Replaces the reference's CUDA op layer (torch_utils/ops/) with XLA-first
primitives; Pallas specializations for profiled hot paths live in
``migan_tpu.ops.pallas``.
"""

from .filters import setup_filter, parse_padding, parse_scaling, filter_size
from .upfirdn2d import upfirdn2d, filter2d, upsample2d, downsample2d
from .bias_act import bias_act, lrelu_agc, get_unit, activation_funcs
from .conv import conv2d, conv2d_resample

__all__ = [
    "setup_filter", "parse_padding", "parse_scaling", "filter_size",
    "upfirdn2d", "filter2d", "upsample2d", "downsample2d",
    "bias_act", "lrelu_agc", "get_unit", "activation_funcs",
    "conv2d", "conv2d_resample",
]
