"""fused_up_block Pallas kernel vs the XLA composition.

Kernel-eligible shapes run the kernel body in interpret mode; an ineligible
shape checks the XLA fallback; `test_kernel_path_is_taken` asserts which
path executed. Numerics must match ops/upfirdn2d.py's upsample2d exactly
(same [1,3,3,1] filter, gain=4) plus the noise/act/skip/sepconv tail.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import migan_tpu.ops.pallas.upblock as upblock_mod
from migan_tpu.ops.pallas.upblock import fused_up_block, _xla_up_block


def _inputs(N, Hl, Wl, C, O, seed=0):
    rng = np.random.RandomState(seed)
    x_lo = jnp.asarray(rng.randn(N, Hl, Wl, C), jnp.float32)
    skip = jnp.asarray(rng.randn(N, 2 * Hl, 2 * Wl, C), jnp.float32)
    nz_up = jnp.asarray(rng.randn(2 * Hl, 2 * Wl) * 0.1, jnp.float32)
    w_dw = jnp.asarray(rng.randn(3, 3, 1, C) * 0.3, jnp.float32)
    b_dw = jnp.asarray(rng.randn(C), jnp.float32)
    w_pw = jnp.asarray(rng.randn(1, 1, C, O) * 0.2, jnp.float32)
    nz2 = jnp.asarray(rng.randn(2 * Hl, 2 * Wl) * 0.1, jnp.float32)
    return x_lo, skip, nz_up, w_dw, b_dw, w_pw, nz2


# Eligible: C % 128 == 0, O % 128 == 0, Wl % 8 == 0, T | Hh*Wl etc.
KERNEL_SHAPES = [
    (2, 8, 16, 128, 128),     # multi-tile per image
    (1, 16, 8, 128, 128),     # narrow rows
    (2, 8, 8, 128, 256),      # O > C
]


@pytest.mark.parametrize("shape", KERNEL_SHAPES)
@pytest.mark.parametrize("use_noise2", [False, True])
def test_fused_up_block_kernel_path(shape, use_noise2):
    N, Hl, Wl, C, O = shape
    x_lo, skip, nz_up, w_dw, b_dw, w_pw, nz2 = _inputs(N, Hl, Wl, C, O)
    n2 = nz2 if use_noise2 else None
    want = np.asarray(_xla_up_block(x_lo, skip, nz_up, w_dw, b_dw, w_pw, n2))
    got = np.asarray(fused_up_block(x_lo, skip, nz_up, w_dw, b_dw, w_pw, n2,
                                    interpret=True, tile_rows=4))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_up_block_fallback_shape():
    # C = 64 fails the lane gate -> XLA path must still be exact.
    x_lo, skip, nz_up, w_dw, b_dw, w_pw, nz2 = _inputs(2, 8, 8, 64, 64)
    want = np.asarray(_xla_up_block(x_lo, skip, nz_up, w_dw, b_dw, w_pw,
                                    nz2))
    got = np.asarray(fused_up_block(x_lo, skip, nz_up, w_dw, b_dw, w_pw,
                                    nz2, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_kernel_path_is_taken(monkeypatch):
    calls = []
    orig = upblock_mod._xla_up_block

    def recording(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(upblock_mod, "_xla_up_block", recording)

    # eligible (unique N=3 so jit tracing isn't cached un-patched)
    x_lo, skip, nz_up, w_dw, b_dw, w_pw, _ = _inputs(3, 8, 16, 128, 128)
    fused_up_block(x_lo, skip, nz_up, w_dw, b_dw, w_pw, None,
                   interpret=True, tile_rows=4)
    assert not calls

    x_lo, skip, nz_up, w_dw, b_dw, w_pw, _ = _inputs(3, 8, 16, 64, 64)
    fused_up_block(x_lo, skip, nz_up, w_dw, b_dw, w_pw, None,
                   interpret=True)
    assert calls


def test_rgb_epilogue_matches_separate_matmul():
    """w_rgb/b_rgb epilogue == act-ed features @ per-phase torgb weights;
    emit_features=False returns only the rgb rows."""
    import numpy as np
    import jax.numpy as jnp
    from migan_tpu.ops.pallas.upblock import fused_up_block

    N, Hl, Wl, C, O, Cr = 2, 16, 16, 128, 128, 6
    rng = np.random.RandomState(21)
    x_lo = jnp.asarray(rng.randn(N, Hl, Wl, C), jnp.float32)
    skip = jnp.asarray(rng.randn(N, 2 * Hl, 2 * Wl, C), jnp.float32)
    nz = jnp.asarray(rng.randn(2 * Hl, 2 * Wl) * 0.1, jnp.float32)
    w_dw = jnp.asarray(rng.randn(3, 3, 1, C) * 0.3, jnp.float32)
    b_dw = jnp.asarray(rng.randn(C), jnp.float32)
    w_pw = jnp.asarray(rng.randn(1, 1, C, O) * 0.2, jnp.float32)
    w_rgb = jnp.asarray(rng.randn(1, 1, O, Cr) * 0.2, jnp.float32)
    b_rgb = jnp.asarray(rng.randn(Cr) * 0.1, jnp.float32)

    feat = fused_up_block(x_lo, skip, nz, w_dw, b_dw, w_pw, nz,
                          interpret=True, packed_out=True)
    NR = N * 2 * Hl * Wl
    want = np.asarray(
        (np.asarray(feat).reshape(NR * 2, O) @ np.asarray(w_rgb[0, 0])
         + np.asarray(b_rgb)).reshape(NR, 2 * Cr))

    feat2, rgb = fused_up_block(x_lo, skip, nz, w_dw, b_dw, w_pw, nz,
                                interpret=True, packed_out=True,
                                w_rgb=w_rgb, b_rgb=b_rgb)
    np.testing.assert_allclose(np.asarray(feat2), np.asarray(feat))
    np.testing.assert_allclose(np.asarray(rgb), want, rtol=1e-4, atol=1e-4)

    rgb_only = fused_up_block(x_lo, skip, nz, w_dw, b_dw, w_pw, nz,
                              interpret=True, packed_out=True,
                              w_rgb=w_rgb, b_rgb=b_rgb,
                              emit_features=False)
    np.testing.assert_allclose(np.asarray(rgb_only), want,
                               rtol=1e-4, atol=1e-4)


def test_rgb_planar_output():
    """rgb_planar=True returns [N, 2, Cr, Hh, Wl] phase/channel planes that
    are exactly the transposed packed rows — via the in-kernel store at
    Wl % 128 == 0 and the host-side conversion at small Wl."""
    import numpy as np
    import jax.numpy as jnp
    from migan_tpu.ops.pallas.upblock import fused_up_block

    C, O, Cr = 128, 128, 6
    rng = np.random.RandomState(7)
    w_dw = jnp.asarray(rng.randn(3, 3, 1, C) * 0.3, jnp.float32)
    b_dw = jnp.asarray(rng.randn(C), jnp.float32)
    w_pw = jnp.asarray(rng.randn(1, 1, C, O) * 0.2, jnp.float32)
    w_rgb = jnp.asarray(rng.randn(1, 1, O, Cr) * 0.2, jnp.float32)
    b_rgb = jnp.asarray(rng.randn(Cr) * 0.1, jnp.float32)

    for N, Hl, Wl in [(2, 8, 128),   # kernel planar store path
                      (2, 8, 16)]:   # host conversion path (Wl % 128 != 0)
        x_lo = jnp.asarray(rng.randn(N, Hl, Wl, C), jnp.float32)
        skip = jnp.asarray(rng.randn(N, 2 * Hl, 2 * Wl, C), jnp.float32)
        nz = jnp.asarray(rng.randn(2 * Hl, 2 * Wl) * 0.1, jnp.float32)
        _, packed = fused_up_block(x_lo, skip, nz, w_dw, b_dw, w_pw, nz,
                                   interpret=True, packed_out=True,
                                   w_rgb=w_rgb, b_rgb=b_rgb)
        _, planar = fused_up_block(x_lo, skip, nz, w_dw, b_dw, w_pw, nz,
                                   interpret=True, packed_out=True,
                                   w_rgb=w_rgb, b_rgb=b_rgb,
                                   rgb_planar=True)
        assert planar.shape == (N, 2, Cr, 2 * Hl, Wl)
        want = (np.asarray(packed).reshape(N, 2 * Hl, Wl, 2, Cr)
                .transpose(0, 3, 4, 1, 2))
        np.testing.assert_allclose(np.asarray(planar), want,
                                   rtol=1e-5, atol=1e-5)


def _d2s(x4):
    """Phase channel groups -> hi-res grid (depth-to-space)."""
    N, H, W, XC = x4.shape
    C = XC // 4
    t = np.asarray(x4).reshape(N, H, W, 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    return t.reshape(N, 2 * H, 2 * W, C)


@pytest.mark.parametrize("packed", [False, True])
def test_pw_up2_phase_matches_conv_then_upfir(packed):
    """The FIR-fold algebra: pw_up2_phase output, interleaved to the hi
    grid, equals pointwise conv followed by ops/upfirdn2d's up2 (the
    model's exact upsample: [1,3,3,1], gain 4, zero edge clip)."""
    from migan_tpu.ops import conv2d, upsample2d, setup_filter
    from migan_tpu.ops.conv import pw_up2_phase

    rng = np.random.RandomState(3)
    N, H, W, Ci, Co = 2, 7, 9, 24, 16
    y = jnp.asarray(rng.randn(N, H, W, Ci), jnp.float32)
    w = jnp.asarray(rng.randn(1, 1, Ci, Co) * 0.2, jnp.float32)
    f = setup_filter([1, 3, 3, 1])
    want = np.asarray(upsample2d(conv2d(y, w), f, up=2))
    got = _d2s(pw_up2_phase(y, w, packed=packed))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_up_block_phase_input():
    """phase_input kernel path == the standard chain [pw -> up-block]:
    both consume the same dw-act output y, one via conv + FIR stencil,
    the other via the MXU phase fold + lane-slice kernel."""
    from migan_tpu.ops import conv2d
    from migan_tpu.ops.conv import pw_up2_phase

    N, Hl, Wl, Ci, C, O = 2, 8, 16, 64, 128, 128
    rng = np.random.RandomState(11)
    y = jnp.asarray(rng.randn(N, Hl, Wl, Ci), jnp.float32)
    w_pw1 = jnp.asarray(rng.randn(1, 1, Ci, C) * 0.2, jnp.float32)
    skip = jnp.asarray(rng.randn(N, 2 * Hl, 2 * Wl, C), jnp.float32)
    nz_up = jnp.asarray(rng.randn(2 * Hl, 2 * Wl) * 0.1, jnp.float32)
    w_dw = jnp.asarray(rng.randn(3, 3, 1, C) * 0.3, jnp.float32)
    b_dw = jnp.asarray(rng.randn(C), jnp.float32)
    w_pw = jnp.asarray(rng.randn(1, 1, C, O) * 0.2, jnp.float32)
    nz2 = jnp.asarray(rng.randn(2 * Hl, 2 * Wl) * 0.1, jnp.float32)

    x_lo = conv2d(y, w_pw1)
    want = np.asarray(_xla_up_block(x_lo, skip, nz_up, w_dw, b_dw, w_pw,
                                    nz2))

    x4 = pw_up2_phase(y, w_pw1)
    assert x4.shape == (N, Hl, Wl, 4 * C)
    # kernel path (interpret)
    got = np.asarray(fused_up_block(x4, skip, nz_up, w_dw, b_dw, w_pw, nz2,
                                    interpret=True, tile_rows=4,
                                    phase_input=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # XLA fallback path (ineligible O)
    from migan_tpu.ops.pallas.upblock import _xla_up_block_phase

    got_fb = np.asarray(_xla_up_block_phase(x4, skip, nz_up, w_dw, b_dw,
                                            w_pw, nz2))
    np.testing.assert_allclose(got_fb, want, rtol=1e-4, atol=1e-5)
