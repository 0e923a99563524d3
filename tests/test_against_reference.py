"""Cross-check our XLA ops against the reference PyTorch implementations.

Runs only when /root/reference is present (dev rounds); the numpy-oracle tests
in test_upfirdn2d.py are the standalone correctness suite. The reference's own
dual-implementation strategy (CUDA vs 'ref' impl, SURVEY.md §4.2) is reused
here with our XLA path vs the reference 'ref' impl on CPU torch.
"""

import sys

import numpy as np
import pytest

REF = "/root/reference"

torch = pytest.importorskip("torch")
if REF not in sys.path:
    sys.path.insert(0, REF)
try:
    from torch_utils.ops import upfirdn2d as ref_upfirdn2d
    from torch_utils.ops import bias_act as ref_bias_act
    from torch_utils.ops import conv2d_resample as ref_conv2d_resample
except Exception:  # pragma: no cover - reference not mounted
    pytest.skip("reference repo not available", allow_module_level=True)

import jax.numpy as jnp
from migan_tpu.ops import (
    setup_filter, upfirdn2d, upsample2d, downsample2d, filter2d,
    bias_act, lrelu_agc, conv2d_resample,
)


def nchw(x_nhwc):
    return torch.tensor(np.transpose(x_nhwc, (0, 3, 1, 2)))


def nhwc(t_nchw):
    return np.transpose(t_nchw.detach().numpy(), (0, 2, 3, 1))


def hwio(w_oihw):
    return jnp.asarray(np.transpose(w_oihw, (2, 3, 1, 0)))


RNG = np.random.RandomState(7)
X = RNG.randn(2, 16, 16, 6).astype(np.float32)
FILT = [1, 3, 3, 1]


@pytest.mark.parametrize("up,down,pad,flip,gain", [
    (1, 1, 0, False, 1.0),
    (2, 1, (2, 1, 2, 1), False, 4.0),
    (1, 2, 1, False, 1.0),
    (2, 2, (-1, 2, 3, -2), True, 2.0),
    (1, 1, (1, 2, 3, 4), False, 0.5),
])
def test_upfirdn2d_vs_reference(up, down, pad, flip, gain):
    f_ref = ref_upfirdn2d.setup_filter(FILT)
    want = nhwc(ref_upfirdn2d.upfirdn2d(
        nchw(X), f_ref, up=up, down=down, padding=pad, flip_filter=flip,
        gain=gain, impl="ref"))
    got = np.asarray(upfirdn2d(jnp.asarray(X), setup_filter(FILT), up=up,
                               down=down, padding=pad, flip_filter=flip,
                               gain=gain))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("wrapper,ref_wrapper", [
    (upsample2d, ref_upfirdn2d.upsample2d),
    (downsample2d, ref_upfirdn2d.downsample2d),
    (filter2d, ref_upfirdn2d.filter2d),
])
def test_wrappers_vs_reference(wrapper, ref_wrapper):
    f_ref = ref_upfirdn2d.setup_filter(FILT)
    want = nhwc(ref_wrapper(nchw(X), f_ref, impl="ref"))
    got = np.asarray(wrapper(jnp.asarray(X), setup_filter(FILT)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("act", ["linear", "relu", "lrelu", "tanh", "sigmoid",
                                 "elu", "selu", "softplus", "swish"])
def test_bias_act_vs_reference(act):
    b = RNG.randn(X.shape[-1]).astype(np.float32)
    want = nhwc(ref_bias_act.bias_act(
        nchw(X), torch.tensor(b), act=act, gain=1.5, clamp=0.7, impl="ref"))
    got = np.asarray(bias_act(jnp.asarray(X), jnp.asarray(b), act=act,
                              gain=1.5, clamp=0.7))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_lrelu_agc_vs_reference():
    sys.path.insert(0, REF)
    from lib.model_zoo.common.utils import lrelu_agc as ref_lrelu_agc

    ref_fn = ref_lrelu_agc(alpha=0.2, gain="sqrt_2", clamp=256)
    want = nhwc(ref_fn(nchw(X * 300), gain=0.5))
    ours = lrelu_agc(alpha=0.2, gain="sqrt_2", clamp=256)
    got = np.asarray(ours(jnp.asarray(X * 300), gain=0.5))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("up,down,groups,kernel,flip_w", [
    (1, 1, 1, 3, True),
    (1, 2, 1, 3, True),
    (2, 1, 1, 3, False),
    (2, 1, 1, 1, True),
    (1, 2, 1, 1, True),
    (1, 1, 6, 3, True),   # depthwise
    (1, 2, 6, 3, True),
    (2, 2, 3, 3, False),
    (1, 1, 2, 1, True),
])
def test_conv2d_resample_vs_reference(up, down, groups, kernel, flip_w):
    oc = 12
    w = RNG.randn(oc, X.shape[-1] // groups, kernel, kernel).astype(np.float32)
    f_ref = ref_upfirdn2d.setup_filter(FILT)
    want = nhwc(ref_conv2d_resample.conv2d_resample(
        nchw(X), torch.tensor(w), f=f_ref, up=up, down=down,
        padding=kernel // 2, groups=groups, flip_weight=flip_w))
    got = np.asarray(conv2d_resample(
        jnp.asarray(X), hwio(w), f=setup_filter(FILT), up=up, down=down,
        padding=kernel // 2, groups=groups, flip_weight=flip_w))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
