"""Fused SeparableConv Pallas kernel vs the XLA composition.

Two tiers:
  - fallback-shape tests (small / unaligned shapes -> `_xla_block` path);
  - kernel-shape tests (interpret mode) that pass every eligibility gate in
    `fused_block` (Cin % 128 == 0, W % 8 == 0, tile % 8 == 0,
    tile + 2*margin <= N*H*W) so the 270-line kernel body actually executes,
    covering the noise / skip / pointwise-prologue variants.
`test_kernel_path_is_taken` asserts which path ran by monkeypatching the
fallback. The compiled (non-interpret) path is exercised on real TPU in
bench/perf runs.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import migan_tpu.ops.pallas.sepconv as sepconv_mod
from migan_tpu.ops.pallas.sepconv import (
    fused_block, fused_sepconv, _xla_block, _xla_sepconv,
)


def _rand_inputs(shape, seed=0):
    N, H, W, C, O = shape
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(N, H, W, C), jnp.float32)
    w_dw = jnp.asarray(rng.randn(3, 3, 1, C) * 0.3, jnp.float32)
    b_dw = jnp.asarray(rng.randn(C), jnp.float32)
    w_pw = jnp.asarray(rng.randn(1, 1, C, O) * 0.3, jnp.float32)
    return x, w_dw, b_dw, w_pw


@pytest.mark.parametrize("shape", [
    (2, 32, 16, 8, 12),
    (1, 16, 8, 8, 8),      # too small -> XLA fallback path
    (3, 64, 32, 16, 8),
    (2, 64, 64, 16, 16),
])
@pytest.mark.parametrize("use_noise", [False, True])
def test_fused_sepconv_matches_oracle_fallback_shapes(shape, use_noise):
    N, H, W, C, O = shape
    x, w_dw, b_dw, w_pw = _rand_inputs(shape)
    rng = np.random.RandomState(1)
    noise = (jnp.asarray(rng.randn(H, W) * 0.1, jnp.float32)
             if use_noise else None)

    want = np.asarray(_xla_sepconv(x, w_dw, b_dw, w_pw, noise))
    got = np.asarray(fused_sepconv(x, w_dw, b_dw, w_pw, noise,
                                   interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# Shapes that pass every kernel-eligibility gate (see fused_block):
#   Cin % 128 == 0, W % 8 == 0, tile % 8 == 0, tile + 2M <= N*H*W.
KERNEL_SHAPES = [
    (2, 32, 32, 128, 64),    # single tile per image, 2 tiles total
    (2, 64, 64, 128, 64),    # VMEM budget forces tile < H*W (multi-tile)
    (4, 16, 32, 128, 128),   # tile spans multiple images' rows
]


def _assert_kernel_eligible(shape):
    """Re-derive the gate arithmetic so shape drift fails loudly."""
    N, H, W, C, _ = shape
    HW, NHW = H * W, N * H * W
    M = ((W + 1 + 7) // 8) * 8
    tile = HW
    budget = 2 * 1024 * 1024
    while tile > 2 * W and (tile + 4 * M) * C * 4 > budget:
        tile //= 2
    assert not (tile + 2 * M > NHW or tile % 8 or W % 8 or C % 128), shape


@pytest.mark.parametrize("shape", KERNEL_SHAPES)
@pytest.mark.parametrize("use_noise", [False, True])
def test_fused_sepconv_kernel_path(shape, use_noise):
    _assert_kernel_eligible(shape)
    N, H, W, C, O = shape
    x, w_dw, b_dw, w_pw = _rand_inputs(shape)
    rng = np.random.RandomState(2)
    noise = (jnp.asarray(rng.randn(H, W) * 0.1, jnp.float32)
             if use_noise else None)

    want = np.asarray(_xla_sepconv(x, w_dw, b_dw, w_pw, noise))
    got = np.asarray(fused_sepconv(x, w_dw, b_dw, w_pw, noise,
                                   interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("has_skip", [False, True])
@pytest.mark.parametrize("has_pre", [False, True])
def test_fused_block_kernel_path_variants(has_skip, has_pre):
    """skip-add and pointwise-prologue variants through the kernel body."""
    shape = (2, 32, 32, 128, 64)
    _assert_kernel_eligible(shape)
    N, H, W, C, O = shape
    x, w_dw, b_dw, w_pw = _rand_inputs(shape, seed=3)
    rng = np.random.RandomState(4)
    skip = (jnp.asarray(rng.randn(N, H, W, C), jnp.float32)
            if has_skip else None)
    # the prologue maps Cin -> C of the depthwise stage; keep Cin == C here
    w_pre = (jnp.asarray(rng.randn(1, 1, C, C) * 0.1, jnp.float32)
             if has_pre else None)
    b_pre = (jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
             if has_pre else None)
    noise = jnp.asarray(rng.randn(H, W) * 0.1, jnp.float32)

    want = np.asarray(_xla_block(x, w_dw, b_dw, w_pw, noise, skip,
                                 w_pre, b_pre))
    got = np.asarray(fused_block(x, w_dw, b_dw, w_pw, noise=noise,
                                 skip=skip, w_pre=w_pre, b_pre=b_pre,
                                 interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_kernel_path_is_taken(monkeypatch):
    """Eligible shapes must NOT route through the XLA fallback (and
    ineligible ones must). Uses shapes unique to this test so jit tracing
    isn't served from cache with the un-patched fallback."""
    calls = []
    orig = sepconv_mod._xla_block

    def recording_fallback(*args, **kw):
        calls.append(1)
        return orig(*args, **kw)

    monkeypatch.setattr(sepconv_mod, "_xla_block", recording_fallback)

    # eligible (unique shape: N=6) -> kernel path, no fallback call
    x, w_dw, b_dw, w_pw = _rand_inputs((6, 16, 32, 128, 64), seed=5)
    fused_sepconv(x, w_dw, b_dw, w_pw, None, interpret=True)
    assert not calls

    # ineligible Cin (unique shape: N=6, C=24) -> fallback
    x, w_dw, b_dw, w_pw = _rand_inputs((6, 16, 32, 24, 16), seed=6)
    fused_sepconv(x, w_dw, b_dw, w_pw, None, interpret=True)
    assert calls


@pytest.mark.parametrize("shape", [(2, 32, 32, 128, 64),
                                   (4, 16, 32, 128, 128)])
def test_fused_block_packed_out(shape):
    """packed_out must equal the NHWC result viewed w-packed (the in-kernel
    [tile, O] -> [tile/2, 2O] relayout)."""
    _assert_kernel_eligible(shape)
    N, H, W, C, O = shape
    x, w_dw, b_dw, w_pw = _rand_inputs(shape, seed=5)
    want = np.asarray(
        fused_block(x, w_dw, b_dw, w_pw, interpret=True)
    ).reshape(N * H * (W // 2), 2 * O)
    got = np.asarray(fused_block(x, w_dw, b_dw, w_pw, interpret=True,
                                 packed_out=True))
    assert got.shape == (N * H * (W // 2), 2 * O)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("packed_out", [False, True])
def test_wide_prologue_kernel_path(monkeypatch, packed_out):
    """Small-Cin prologue (Cin=8 -> G=16 wide rows) through the kernel body,
    matching the XLA oracle; asserts no fallback."""
    called = []
    orig = sepconv_mod._xla_block
    monkeypatch.setattr(sepconv_mod, "_xla_block",
                        lambda *a, **k: (called.append(1), orig(*a, **k))[1])
    N, H, W, Cin, C, O = 2, 32, 32, 8, 128, 128
    rng = np.random.RandomState(31)
    x = jnp.asarray(rng.randn(N, H, W, Cin), jnp.float32)
    w_pre = jnp.asarray(rng.randn(1, 1, Cin, C) * 0.2, jnp.float32)
    b_pre = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
    w_dw = jnp.asarray(rng.randn(3, 3, 1, C) * 0.3, jnp.float32)
    b_dw = jnp.asarray(rng.randn(C), jnp.float32)
    w_pw = jnp.asarray(rng.randn(1, 1, C, O) * 0.2, jnp.float32)

    want = np.asarray(_xla_block(x, w_dw[:, :, 0], b_dw, w_pw[0, 0], None,
                                 None, w_pre[0, 0], b_pre))
    if packed_out:
        want = want.reshape(N * H * (W // 2), 2 * O)
    got = np.asarray(fused_block(x, w_dw, b_dw, w_pw, w_pre=w_pre,
                                 b_pre=b_pre, interpret=True,
                                 packed_out=packed_out))
    assert not called, "fell back to XLA"
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
