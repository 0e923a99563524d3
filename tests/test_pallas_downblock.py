"""fused_down_block Pallas kernel vs the XLA composition.

Kernel-eligible shapes run the kernel body in interpret mode; an ineligible
shape checks the XLA fallback; `test_kernel_path_is_taken` asserts which
path executed. Numerics must match ops/upfirdn2d.py's downsample2d exactly
(same [1,3,3,1]/8 filter, (1,1) zero padding).
"""

import numpy as np
import pytest
import jax.numpy as jnp

import migan_tpu.ops.pallas.downblock as downblock_mod
from migan_tpu.ops.pallas.downblock import fused_down_block, _xla_down_block


def _inputs(N, Hh, Wh, C, O, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(N, Hh, Wh, C), jnp.float32)
    w_dw = jnp.asarray(rng.randn(3, 3, 1, C) * 0.3, jnp.float32)
    b_dw = jnp.asarray(rng.randn(C), jnp.float32)
    w_pw = jnp.asarray(rng.randn(1, 1, C, O) * 0.2, jnp.float32)
    return x, w_dw, b_dw, w_pw


KERNEL_SHAPES = [
    (2, 16, 32, 128, 128),   # multi-tile per image
    (1, 32, 16, 128, 256),   # O > C, narrow rows
    (2, 8, 16, 128, 128),    # minimal height
]


@pytest.mark.parametrize("shape", KERNEL_SHAPES)
def test_fused_down_block_kernel_path(shape):
    N, Hh, Wh, C, O = shape
    x, w_dw, b_dw, w_pw = _inputs(N, Hh, Wh, C, O)
    want = np.asarray(_xla_down_block(x, w_dw, b_dw, w_pw))
    got = np.asarray(fused_down_block(x, w_dw, b_dw, w_pw, interpret=True,
                                      tile_rows=2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_down_block_fallback_shape():
    x, w_dw, b_dw, w_pw = _inputs(2, 8, 16, 64, 64)
    want = np.asarray(_xla_down_block(x, w_dw, b_dw, w_pw))
    got = np.asarray(fused_down_block(x, w_dw, b_dw, w_pw, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_kernel_path_is_taken(monkeypatch):
    calls = []
    orig = downblock_mod._xla_down_block

    def recording(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(downblock_mod, "_xla_down_block", recording)

    x, w_dw, b_dw, w_pw = _inputs(3, 16, 32, 128, 128)   # unique N=3
    fused_down_block(x, w_dw, b_dw, w_pw, interpret=True, tile_rows=2)
    assert not calls

    x, w_dw, b_dw, w_pw = _inputs(3, 16, 32, 64, 64)
    fused_down_block(x, w_dw, b_dw, w_pw, interpret=True)
    assert calls


def test_packed_out_matches_flat():
    """packed_out must equal the NHWC result viewed w-packed at the lo res."""
    import numpy as np
    import jax.numpy as jnp
    from migan_tpu.ops.pallas.downblock import fused_down_block

    N, Hh, Wh, C, O = 2, 32, 32, 128, 128
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(N, Hh, Wh, C), jnp.float32)
    w_dw = jnp.asarray(rng.randn(3, 3, 1, C) * 0.3, jnp.float32)
    b_dw = jnp.asarray(rng.randn(C), jnp.float32)
    w_pw = jnp.asarray(rng.randn(1, 1, C, O) * 0.3, jnp.float32)
    want = np.asarray(fused_down_block(x, w_dw, b_dw, w_pw, interpret=True,
                                       tile_rows=4))
    got = np.asarray(fused_down_block(x, w_dw, b_dw, w_pw, interpret=True,
                                      tile_rows=4, packed_out=True))
    Hl, Wl = Hh // 2, Wh // 2
    assert got.shape == (N * Hl * Wl // 2, 2 * O)
    np.testing.assert_allclose(got, want.reshape(N * Hl * Wl // 2, 2 * O),
                               rtol=1e-6, atol=1e-6)
