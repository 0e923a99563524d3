"""Packed-layout fused sepconv kernel vs the XLA composition.

Kernel-shape tests run in interpret mode through the real kernel body
(eligibility: C % 128 == 0, Wp % 8 == 0, tiles divide images);
`test_kernel_path_is_taken` pins which path ran. Fallback shapes go through
`_xla_packed`. The compiled path is exercised on real TPU by the bench.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import migan_tpu.ops.pallas.packedblock as pb
from migan_tpu.ops.pallas.packedblock import (
    fused_block_packed, blockdiag2, _xla_packed,
)
from migan_tpu.ops.pallas.sepconv import _xla_sepconv


def _mk(shape, seed=0):
    N, H, W, C, O = shape
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(N, H, W, C), jnp.float32)
    w_dw = jnp.asarray(rng.randn(3, 3, 1, C) * 0.3, jnp.float32)
    b_dw = jnp.asarray(rng.randn(C), jnp.float32)
    w_pw = jnp.asarray(rng.randn(1, 1, C, O) * 0.3, jnp.float32)
    return x, w_dw, b_dw, w_pw


def _pack(x):
    N, H, W, C = x.shape
    return x.reshape(N * H * (W // 2), 2 * C)


def _unpack(y2d, N, H, W):
    O = y2d.shape[-1] // 2
    return y2d.reshape(N, H, W, O)


@pytest.mark.parametrize("use_noise", [False, True])
@pytest.mark.parametrize("shape", [
    (2, 16, 16, 128, 128),     # eligible: Wp=8, 2 images, multi-tile
    (1, 32, 16, 128, 256),     # eligible: O=2C
    (1, 8, 48, 128, 128),      # eligible: Wp=24
])
def test_kernel_matches_oracle(shape, use_noise):
    N, H, W, C, O = shape
    x, w_dw, b_dw, w_pw = _mk(shape)
    noise = (jnp.asarray(np.random.RandomState(1).randn(H, W) * 0.1,
                         jnp.float32) if use_noise else None)
    want = np.asarray(_xla_sepconv(x, w_dw, b_dw, w_pw, noise))
    got2d = fused_block_packed(_pack(x), N, H, W, w_dw, b_dw, w_pw,
                               noise=noise, interpret=True, tile_rows=4)
    got = np.asarray(_unpack(got2d, N, H, W))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_kernel_path_is_taken(monkeypatch):
    called = {"fallback": 0}
    orig = pb._xla_packed

    def spy(*a, **k):
        called["fallback"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(pb, "_xla_packed", spy)
    N, H, W, C, O = 2, 16, 16, 128, 128
    x, w_dw, b_dw, w_pw = _mk((N, H, W, C, O))
    fused_block_packed(_pack(x), N, H, W, w_dw, b_dw, w_pw,
                       interpret=True, tile_rows=4)
    assert called["fallback"] == 0
    # unaligned channels -> fallback
    xs, w_dws, b_dws, w_pws = _mk((2, 16, 16, 8, 8))
    fused_block_packed(_pack(xs), 2, 16, 16, w_dws, b_dws, w_pws,
                       interpret=True)
    assert called["fallback"] == 1


def test_fallback_matches_oracle():
    N, H, W, C, O = 2, 16, 16, 8, 8
    x, w_dw, b_dw, w_pw = _mk((N, H, W, C, O))
    want = np.asarray(_xla_sepconv(x, w_dw, b_dw, w_pw, None))
    got = np.asarray(_unpack(
        _xla_packed(_pack(x), N, H, W, w_dw[:, :, 0], b_dw, w_pw[0, 0],
                    None), N, H, W))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_blockdiag2_applies_per_phase():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(4, 6), jnp.float32)
    xE = jnp.asarray(rng.randn(5, 4), jnp.float32)
    xO = jnp.asarray(rng.randn(5, 4), jnp.float32)
    packed = jnp.concatenate([xE, xO], axis=1) @ blockdiag2(w)
    np.testing.assert_allclose(np.asarray(packed[:, :6]),
                               np.asarray(xE @ w), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(packed[:, 6:]),
                               np.asarray(xO @ w), rtol=1e-5)


@pytest.mark.parametrize("final_act", [True, False])
def test_flat_out_and_final_act(final_act):
    """flat_out must equal the packed result re-interleaved; final_act=False
    must drop only the trailing activation."""
    from migan_tpu.ops.pallas.sepconv import _act
    from migan_tpu.ops import conv2d

    N, H, W, C, O = 2, 16, 16, 128, 128
    x, w_dw, b_dw, w_pw = _mk((N, H, W, C, O), seed=7)
    want = _act(conv2d(x, w_dw, padding=1, groups=C)
                + b_dw.astype(x.dtype))
    want = conv2d(want, w_pw)
    if final_act:
        want = _act(want)
    want = np.asarray(want).reshape(N * H * W, O)
    got = np.asarray(fused_block_packed(
        _pack(x), N, H, W, w_dw, b_dw, w_pw, interpret=True, tile_rows=4,
        final_act=final_act, flat_out=True))
    assert got.shape == (N * H * W, O)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
