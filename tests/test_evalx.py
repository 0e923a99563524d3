"""Eval subsystem: inception/lpips structure, FID math, evaluators."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from migan_tpu.evalx.inception import inception_init, inception_apply
from migan_tpu.evalx.lpips import lpips_init, lpips_apply
from migan_tpu.evalx.fid import (FeatureStats, frechet_distance,
                                 fid_from_feature_arrays)
from migan_tpu.evalx.evaluators import get_evaluator, ssim_nhwc


def test_inception_output_shape_and_determinism():
    params = inception_init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    feats = inception_apply(params, x)
    assert feats.shape == (2, 2048)
    feats2 = inception_apply(params, x)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(feats2))


@pytest.mark.slow
def test_inception_batch_consistency():
    """Per-sample features must not depend on batchmates."""
    params = inception_init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(2), (4, 64, 64, 3))
    full = np.asarray(inception_apply(params, x))
    solo = np.asarray(inception_apply(params, x[:1]))
    np.testing.assert_allclose(full[:1], solo, rtol=1e-4, atol=1e-5)


def test_lpips_properties():
    params = lpips_init(jax.random.PRNGKey(0))
    a = jax.random.uniform(jax.random.PRNGKey(1), (3, 64, 64, 3))
    b = jax.random.uniform(jax.random.PRNGKey(2), (3, 64, 64, 3))
    d_same = np.asarray(lpips_apply(params, a, a))
    d_diff = np.asarray(lpips_apply(params, a, b))
    assert d_same.shape == (3,)
    np.testing.assert_allclose(d_same, 0.0, atol=1e-6)
    assert (d_diff > 0).all()


@pytest.mark.slow
def test_detector_bf16_tolerance():
    """compute_dtype='bfloat16' (cli/evaluate --detector-dtype bfloat16,
    bench eval_imgs_per_sec_bf16_detectors) must stay metrically close to
    f32. Bounds set from measured deltas with random weights (LPIPS
    per-image rel err max 5e-4; Inception elementwise rel err mean 0.5%)
    with ~4x margin."""
    inc = inception_init(jax.random.PRNGKey(0))
    lp = lpips_init(jax.random.PRNGKey(1))
    a = jax.random.uniform(jax.random.PRNGKey(2), (8, 64, 64, 3))
    b = jnp.clip(a + 0.1 * jax.random.normal(jax.random.PRNGKey(3),
                                             a.shape), 0, 1)

    # LPIPS: the scalar metric itself, per image.
    l32 = np.asarray(lpips_apply(lp, a, b))
    l16 = np.asarray(lpips_apply(lp, a, b, compute_dtype="bfloat16"))
    rel = np.abs(l16 - l32) / (np.abs(l32) + 1e-9)
    assert rel.max() < 2e-3, rel

    # Inception: FID is a function of feature mean+covariance; bound the
    # per-image feature vector drift in L2 (drives both statistics).
    f32_feats = np.asarray(inception_apply(inc, a))
    f16_feats = np.asarray(inception_apply(inc, a,
                                           compute_dtype="bfloat16"))
    l2_rel = (np.linalg.norm(f16_feats - f32_feats, axis=1)
              / np.linalg.norm(f32_feats, axis=1))
    assert l2_rel.max() < 3e-2, l2_rel


def test_feature_stats_streaming_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.randn(100, 16)
    fs = FeatureStats()
    for chunk in np.split(x, 10):
        fs.append(chunk)
    mean, cov = fs.get_mean_cov()
    np.testing.assert_allclose(mean, x.mean(0), atol=1e-12)
    np.testing.assert_allclose(cov, np.cov(x, rowvar=False, bias=True),
                               atol=1e-12)


def test_feature_stats_max_items():
    fs = FeatureStats(max_items=5)
    fs.append(np.ones((3, 4)))
    fs.append(np.ones((3, 4)))
    assert fs.num_items == 5 and fs.is_full()


def test_frechet_distance_identity_and_shift():
    rng = np.random.RandomState(1)
    x = rng.randn(500, 8)
    assert abs(fid_from_feature_arrays(x, x)) < 1e-6
    y = x + 2.0
    d = fid_from_feature_arrays(x, y)
    assert abs(d - 8 * 4.0) < 0.5  # ||mu diff||^2 = 8 * 2^2


def test_psnr_ssim_evaluators():
    rng = np.random.RandomState(0)
    gt = rng.rand(4, 32, 32, 3).astype(np.float32)
    noisy = np.clip(gt + rng.randn(4, 32, 32, 3).astype(np.float32) * 0.05,
                    0, 1)
    ev = get_evaluator([
        {"type": "psnr", "args": {"for_dataset": None, "rgb_range": 1}},
        {"type": "ssim", "args": {}},
    ])
    ev.set_sample_n(4)
    ev.add_batch(noisy, gt)
    out = ev.compute()
    assert 20 < out["psnr"] < 40
    assert 0.5 < out["ssim"] < 1.0
    # identical images
    ev.clear_data()
    ev.add_batch(gt, gt)
    out = ev.compute()
    assert out["ssim"] > 0.999


def test_ssim_matches_reference_impl():
    """Cross-check our SSIM against the reference torch implementation."""
    import sys
    import pytest

    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    try:
        from lib.evaluator.eva_ssim import compute_ssim
    except Exception:
        pytest.skip("reference not available")
    rng = np.random.RandomState(3)
    a = rng.rand(2, 32, 32, 3).astype(np.float32)
    b = rng.rand(2, 32, 32, 3).astype(np.float32)
    want = compute_ssim(torch.tensor(a.transpose(0, 3, 1, 2)),
                        torch.tensor(b.transpose(0, 3, 1, 2)),
                        size_average=False).numpy()
    got = np.asarray(ssim_nhwc(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
