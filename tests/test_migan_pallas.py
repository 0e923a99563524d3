"""Pallas whole-stage inference path vs the standard generator.

Uses a shrunken config (resolution 64, ch_base 4096) whose top stage has
the same folded-channel geometry as migan-512 (c_top=64 -> folded 128), so
the fused_block / fused_down_block / fused_up_block kernels genuinely
engage (asserted via fallback monkeypatching) while staying small enough
for interpret mode on CPU.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import migan_tpu.ops.pallas.upblock as upblock_mod
import migan_tpu.ops.pallas.downblock as downblock_mod
import migan_tpu.ops.pallas.sepconv as sepconv_mod
from migan_tpu.models.migan_inference import (
    GeneratorConfig, generator_init, generator_apply,
)
from migan_tpu.models.migan_pallas import (
    generator_apply_pallas, pallas_stage_eligible,
)

CFG = GeneratorConfig(resolution=64, ch_base=4096)


@pytest.fixture(scope="module")
def params():
    return generator_init(jax.random.PRNGKey(7), CFG)


def test_geometry_matches_migan512():
    """The shrunken config exercises the same top-stage channel geometry
    as the flagship migan-512 (c_top 64 -> folded 128/256)."""
    assert CFG.ch(CFG.encode_res[0]) == 64
    assert GeneratorConfig(resolution=512).ch(512) == 64
    assert pallas_stage_eligible(CFG, 2)
    assert pallas_stage_eligible(GeneratorConfig(resolution=512), 2)


@pytest.mark.slow
def test_pallas_path_matches_standard(params, monkeypatch):
    # set noise strengths non-zero so the noise path is exercised
    for blk in params["synthesis"].values():
        for c in ("conv1", "conv2"):
            if "noise_strength" in blk.get(c, {}):
                blk[c]["noise_strength"] = jnp.asarray(0.3, jnp.float32)

    fallbacks = []
    for mod, name in ((upblock_mod, "_xla_up_block"),
                      (downblock_mod, "_xla_down_block"),
                      (sepconv_mod, "_xla_block")):
        orig = getattr(mod, name)

        def rec(*a, _orig=orig, _name=name, **k):
            fallbacks.append(_name)
            return _orig(*a, **k)

        monkeypatch.setattr(mod, name, rec)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 64, 4), jnp.float32)
    want = np.asarray(generator_apply(params, x, CFG))
    got = np.asarray(generator_apply_pallas(params, x, CFG, interpret=True))
    assert not fallbacks, f"kernels fell back: {fallbacks}"
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    # the bulk of pixels should agree much tighter than the worst case
    assert np.median(np.abs(got - want)) < 1e-5


def test_odd_batch_falls_back(params):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 64, 64, 4), jnp.float32)
    want = np.asarray(generator_apply(params, x, CFG))
    got = np.asarray(generator_apply_pallas(params, x, CFG, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_pallas_path_three_level_chain():
    """resolution 128 / ch_base 8192 reproduces migan-512's full packed
    ladder (folded 128/256/512 over three stages, n_packed=3)."""
    cfg = GeneratorConfig(resolution=128, ch_base=8192)
    assert cfg.ch(128) == 64 and cfg.ch(64) == 128 and cfg.ch(32) == 256
    assert min(3, cfg.log2res - 4) == 3
    params = generator_init(jax.random.PRNGKey(9), cfg)
    for blk in params["synthesis"].values():
        for c in ("conv1", "conv2"):
            if "noise_strength" in blk.get(c, {}):
                blk[c]["noise_strength"] = jnp.asarray(0.3, jnp.float32)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 128, 128, 4), jnp.float32)
    want = np.asarray(generator_apply(params, x, cfg))
    got = np.asarray(generator_apply_pallas(params, x, cfg, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    assert np.median(np.abs(got - want)) < 1e-5


def test_up2_planar_matches_upsample2d():
    """The phase-planar FIR pyramid step (banded matmuls) must be
    numerically identical to ops/upfirdn2d.upsample2d on the same image."""
    import numpy as np
    import jax.numpy as jnp
    from migan_tpu.ops.filters import setup_filter
    from migan_tpu.ops import upsample2d
    from migan_tpu.models.migan_pallas import _up2_planar

    rng = np.random.RandomState(11)
    Nf, C, h, w = 2, 6, 8, 16
    img = jnp.asarray(rng.randn(Nf, h, w, C), jnp.float32)
    want = np.asarray(upsample2d(img, setup_filter([1, 3, 3, 1]), up=2))

    P = img.reshape(Nf, h, w // 2, 2, C).transpose(0, 3, 4, 1, 2)
    E, O = P[:, 0], P[:, 1]
    E2, O2 = _up2_planar(E, O)
    got = (jnp.stack([E2, O2], axis=-1)           # (n, c, 2h, w, phase)
           .transpose(0, 2, 3, 4, 1)              # (n, 2h, w, phase, c)
           .reshape(Nf, 2 * h, 2 * w, C))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_pallas_path_unfolded_matches_standard():
    """migan-256 geometry: c_top = 128 fills the lanes directly, so the
    packed chain runs UNFOLDED (fold factor 1) — parity vs the oracle."""
    from migan_tpu.models.migan_pallas import _fold_factor

    cfg = GeneratorConfig(resolution=64, ch_base=8192)
    assert cfg.ch(cfg.encode_res[0]) == 128
    assert GeneratorConfig(resolution=256).ch(256) == 128
    assert _fold_factor(cfg, 2) == 1
    assert _fold_factor(GeneratorConfig(resolution=256), 2) == 1

    p = generator_init(jax.random.PRNGKey(3), cfg)
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 64, 64, 4), jnp.float32)
    want = np.asarray(generator_apply(p, x, cfg))
    got = np.asarray(generator_apply_pallas(p, x, cfg, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_small_resolution_falls_back_cleanly():
    """Configs whose packed ladder would have < 2 levels must fall back to
    the standard path instead of crashing (regression: the widened
    unfolded gate briefly admitted them)."""
    from migan_tpu.models.migan_pallas import _fold_factor

    for res in (16, 32):
        cfg = GeneratorConfig(resolution=res)
        assert _fold_factor(cfg, 2) == 0
        p = generator_init(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(
            np.random.RandomState(0).randn(2, res, res, 4), jnp.float32)
        want = np.asarray(generator_apply(p, x, cfg))
        got = np.asarray(generator_apply_pallas(p, x, cfg, interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_nchw_exit_matches_nhwc(params):
    """out_layout="nchw" must be the NHWC output transposed — for the
    folded chain (ff=2), the unfolded chain (ff=1), and the fallback."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 64, 64, 4), jnp.float32)
    nhwc = np.asarray(generator_apply_pallas(params, x, CFG, interpret=True))
    nchw = np.asarray(generator_apply_pallas(params, x, CFG, interpret=True,
                                             out_layout="nchw"))
    np.testing.assert_array_equal(nchw, nhwc.transpose(0, 3, 1, 2))

    cfg1 = GeneratorConfig(resolution=64, ch_base=8192)  # unfolded (ff=1)
    p1 = generator_init(jax.random.PRNGKey(3), cfg1)
    nhwc = np.asarray(generator_apply_pallas(p1, x, cfg1, interpret=True))
    nchw = np.asarray(generator_apply_pallas(p1, x, cfg1, interpret=True,
                                             out_layout="nchw"))
    np.testing.assert_array_equal(nchw, nhwc.transpose(0, 3, 1, 2))

    x1 = x[:1]  # odd batch -> standard-path fallback
    nhwc = np.asarray(generator_apply_pallas(params, x1, CFG, interpret=True))
    nchw = np.asarray(generator_apply_pallas(params, x1, CFG, interpret=True,
                                             out_layout="nchw"))
    np.testing.assert_array_equal(nchw, nhwc.transpose(0, 3, 1, 2))
