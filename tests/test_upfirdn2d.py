"""upfirdn2d / filter2d / upsample2d / downsample2d numerics.

Oracle: a direct numpy implementation of the documented algorithm
(zero-insert -> pad/crop -> 2D FIR correlation of flipped filter -> subsample),
written from the spec in reference torch_utils/ops/upfirdn2d.py:121-135.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from migan_tpu.ops import setup_filter, upfirdn2d, filter2d, upsample2d, downsample2d


def upfirdn2d_oracle(x, f, up=(1, 1), down=(1, 1), pad=(0, 0, 0, 0),
                     flip_filter=False, gain=1.0):
    """NHWC numpy oracle. f: [fh,fw] or [taps]."""
    f = np.asarray(f, np.float64)
    if f.ndim == 1:
        # separable: x-pass then y-pass with sqrt(gain) each
        g = float(gain) ** 0.5
        x = upfirdn2d_oracle(x, f[None, :], (up[0], 1), (down[0], 1),
                             (pad[0], pad[1], 0, 0), flip_filter, g)
        return upfirdn2d_oracle(x, f[:, None], (1, up[1]), (1, down[1]),
                                (0, 0, pad[2], pad[3]), flip_filter, g)
    upx, upy = up
    downx, downy = down
    px0, px1, py0, py1 = pad
    N, H, W, C = x.shape
    z = np.zeros((N, H * upy, W * upx, C), np.float64)
    z[:, ::upy, ::upx, :] = x
    z = np.pad(z, ((0, 0), (max(py0, 0), max(py1, 0)),
                   (max(px0, 0), max(px1, 0)), (0, 0)))
    z = z[:, max(-py0, 0):z.shape[1] - max(-py1, 0),
          max(-px0, 0):z.shape[2] - max(-px1, 0), :]
    ff = f * float(gain)
    if not flip_filter:
        ff = ff[::-1, ::-1]
    fh, fw = ff.shape
    oh, ow = z.shape[1] - fh + 1, z.shape[2] - fw + 1
    out = np.zeros((N, oh, ow, C), np.float64)
    for i in range(fh):
        for j in range(fw):
            out += ff[i, j] * z[:, i:i + oh, j:j + ow, :]
    return out[:, ::downy, ::downx, :].astype(np.float32)


RNG = np.random.RandomState(0)
X = RNG.randn(2, 8, 8, 3).astype(np.float32)
F4 = np.asarray(setup_filter([1, 3, 3, 1]))  # 4x4 outer product, normalized


@pytest.mark.parametrize("up,down,pad,flip,gain", [
    ((1, 1), (1, 1), (1, 1, 1, 1), False, 1.0),
    ((2, 2), (1, 1), (2, 1, 2, 1), False, 4.0),
    ((1, 1), (2, 2), (1, 1, 1, 1), False, 1.0),
    ((2, 2), (2, 2), (-1, 2, 3, -2), False, 2.0),
    ((1, 1), (1, 1), (-2, -1, 0, 3), True, 1.0),
    ((2, 1), (1, 3), (0, 1, 2, 0), False, 1.0),
    ((4, 4), (1, 1), (2, 2, 2, 2), False, 16.0),
])
def test_upfirdn2d_matches_oracle(up, down, pad, flip, gain):
    got = np.asarray(upfirdn2d(jnp.asarray(X), jnp.asarray(F4), up=up,
                               down=down, padding=pad, flip_filter=flip,
                               gain=gain))
    want = upfirdn2d_oracle(X, F4, up, down, pad, flip, gain)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upfirdn2d_asymmetric_filter():
    f = RNG.randn(3, 5).astype(np.float32)
    got = np.asarray(upfirdn2d(jnp.asarray(X), jnp.asarray(f), up=2, down=1,
                               padding=(1, 2, 3, 0)))
    want = upfirdn2d_oracle(X, f, (2, 2), (1, 1), (1, 2, 3, 0))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_upfirdn2d_separable():
    f = np.asarray(setup_filter(list(range(1, 9))))  # 8 taps -> separable 1-D
    assert f.ndim == 1
    got = np.asarray(upfirdn2d(jnp.asarray(X), jnp.asarray(f), up=2, down=2,
                               padding=(3, 3, 3, 3), gain=4.0))
    want = upfirdn2d_oracle(X, f, (2, 2), (2, 2), (3, 3, 3, 3), gain=4.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_upfirdn2d_identity():
    got = np.asarray(upfirdn2d(jnp.asarray(X), None))
    np.testing.assert_allclose(got, X, rtol=1e-6)


def test_filter2d_preserves_shape():
    got = np.asarray(filter2d(jnp.asarray(X), jnp.asarray(F4)))
    assert got.shape == X.shape
    want = upfirdn2d_oracle(X, F4, (1, 1), (1, 1), (2, 1, 2, 1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upsample2d_doubles_shape_and_preserves_dc():
    ones = np.ones((1, 8, 8, 2), np.float32)
    got = np.asarray(upsample2d(jnp.asarray(ones), jnp.asarray(F4)))
    assert got.shape == (1, 16, 16, 2)
    # DC magnitude preserved away from borders (gain = up^2 * normalized f)
    np.testing.assert_allclose(got[:, 4:-4, 4:-4, :], 1.0, rtol=1e-5)


def test_downsample2d_halves_shape_and_preserves_dc():
    ones = np.ones((1, 8, 8, 2), np.float32)
    got = np.asarray(downsample2d(jnp.asarray(ones), jnp.asarray(F4)))
    assert got.shape == (1, 4, 4, 2)
    np.testing.assert_allclose(got[:, 1:-1, 1:-1, :], 1.0, rtol=1e-5)


def test_grad_and_double_grad():
    """R1 needs second-order gradients through every resampling op
    (reference loss.py:225-229 / conv2d_gradfix rationale)."""
    import jax

    f = jnp.asarray(F4)

    def loss(x):
        y = upfirdn2d(x, f, up=2, down=1, padding=(2, 1, 2, 1))
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(jnp.asarray(X))
    assert g.shape == X.shape and np.isfinite(np.asarray(g)).all()

    def gradnorm(x):
        return jnp.sum(jax.grad(loss)(x) ** 2)

    gg = jax.grad(gradnorm)(jnp.asarray(X))
    assert gg.shape == X.shape and np.isfinite(np.asarray(gg)).all()
