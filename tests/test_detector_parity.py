"""Detector numerics: JAX InceptionV3 (FID flavor) and LPIPS-alex must
reproduce the torch detectors' activations given the same state_dict.

The torch side (tests/torch_oracles.py) re-implements the published
pytorch_fid / lpips architectures the reference evaluates with
(reference scripts/evaluate_fid_lpips.py:212-218). Random seeded weights
flow torch.state_dict() -> import_* -> activation comparison — the same
methodology as the generator parity tests (tests/test_migan_inference.py).
With parity proven on random weights, FID/LPIPS numbers become trustworthy
as soon as the real published weights are supplied to the same importers.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from migan_tpu.evalx.inception import (
    inception_apply, inception_apply_nvidia, import_inception_state_dict,
    import_inception_tf_names,
)
from migan_tpu.evalx.lpips import lpips_apply, import_lpips_state_dict
from torch_oracles import (
    TorchFIDInception, TorchNVIDIAInception, TorchLPIPSAlex,
    randomize_inception_, randomize_lpips_,
)


def _to_numpy_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def inception_pair():
    model = randomize_inception_(TorchFIDInception(), seed=0)
    params = import_inception_state_dict(_to_numpy_sd(model))
    return model, params


def test_inception_feature_parity(inception_pair):
    """Full 94-conv network, 299 input (no resize): exact arch parity."""
    model, params = inception_pair
    rng = np.random.RandomState(0)
    x = rng.rand(2, 299, 299, 3).astype(np.float32)

    with torch.no_grad():
        model.resize_input = False
        want = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(inception_apply(params, jnp.asarray(x),
                                     resize_input=False))
    assert got.shape == (2, 2048)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_inception_feature_parity_with_resize(inception_pair):
    """256 input through the internal bilinear resize to 299 — the exact
    eval-path contract (pytorch_fid resize_input=True)."""
    model, params = inception_pair
    rng = np.random.RandomState(1)
    x = rng.rand(2, 256, 256, 3).astype(np.float32)

    with torch.no_grad():
        model.resize_input = True
        want = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(inception_apply(params, jnp.asarray(x),
                                     resize_input=True))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("res", [64, 256])
def test_nvidia_inception_feature_parity(res):
    """Training-time FID flavor (SURVEY §3.3 second detector; reference
    frechet_inception_distance.py:25-29): TF-named state_dict import +
    raw-[0,255] contract + TF-legacy resize. The oracle resizes via the
    TorchScript's grid_sample trick; the JAX side via direct gather+lerp
    arithmetic — agreement proves both the importer's name/orientation
    table and the resize semantics."""
    model = randomize_inception_(TorchNVIDIAInception(), seed=3)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = import_inception_tf_names(sd)

    rng = np.random.RandomState(res)
    x = rng.randint(0, 256, (2, res, res, 3)).astype(np.float32)

    with torch.no_grad():
        want = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(inception_apply_nvidia(params, jnp.asarray(x)))
    assert got.shape == (2, 2048)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_two_fid_flavors_preprocess_differently():
    """The two detectors share the backbone but NOT preprocessing — the
    reference's training-log FID and standalone-eval FID are different
    numbers (SURVEY §3.3). The defining delta is the resize: TF legacy
    (src = dst*scale, no half-pixel offset) vs torch/jax bilinear
    (half-pixel). On a linear ramp the legacy variant lands a half-texel
    shifted grid — guard that the two resizes don't silently collapse
    into one code path."""
    import jax

    from migan_tpu.evalx.inception import tf_resize_bilinear

    ramp = jnp.broadcast_to(
        jnp.linspace(0.0, 255.0, 64)[None, None, :, None], (1, 64, 64, 1))
    tf_up = np.asarray(tf_resize_bilinear(ramp, 299, 299))
    hp_up = np.asarray(jax.image.resize(ramp, (1, 299, 299, 1), "bilinear"))
    # half-texel shift on a ramp of slope 255/63 per texel -> ~2.0 units
    assert np.abs(tf_up - hp_up).max() > 1.0
    # and the TF variant is anchored at the top-left corner exactly
    np.testing.assert_allclose(tf_up[0, 0, 0, 0], 0.0, atol=1e-5)


def test_load_inception_weights_flavor_autodetect(tmp_path):
    """load_inception_weights detects which of the two FID-detector layouts
    a weight file holds (torchvision names vs TF tower names) and routes to
    the right importer; make_detector wraps either flavor behind the
    metrics-stack NHWC-[0,1] contract (with the reference's uint8
    quantization baked into the nvidia_tf path, metric_utils.py:40-51)."""
    from migan_tpu.evalx.inception import load_inception_weights, make_detector

    tv = randomize_inception_(TorchFIDInception(), seed=7)
    nv = randomize_inception_(TorchNVIDIAInception(), seed=7)
    p_tv = tmp_path / "pt_inception.pt"
    p_nv = tmp_path / "inception-2015-12-05.pt"
    torch.save(tv.state_dict(), p_tv)
    torch.save(nv.state_dict(), p_nv)

    params_tv, flavor_tv = load_inception_weights(str(p_tv))
    params_nv, flavor_nv = load_inception_weights(str(p_nv))
    assert flavor_tv == "pytorch_fid" and flavor_nv == "nvidia_tf"
    with pytest.raises(ValueError, match="flavor"):
        load_inception_weights(str(p_tv), flavor="nvidia_tf")

    rng = np.random.RandomState(9)
    x01 = rng.rand(2, 64, 64, 3).astype(np.float32)

    det_nv = make_detector(params_nv, flavor_nv)
    # reference contract: composites are cast to uint8 before the NVIDIA
    # detector — round-half-up of x01*255
    x_u8 = np.floor(x01 * 255.0 + 0.5)
    with torch.no_grad():
        want = nv(torch.from_numpy(x_u8.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(det_nv(jnp.asarray(x01))), want,
                               rtol=1e-3, atol=1e-4)

    det_tv = make_detector(params_tv, flavor_tv)
    with torch.no_grad():
        tv.resize_input = True
        want = tv(torch.from_numpy(x01.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(det_tv(jnp.asarray(x01))), want,
                               rtol=1e-3, atol=1e-4)


def test_lpips_parity():
    model = randomize_lpips_(TorchLPIPSAlex(), seed=0)
    params = import_lpips_state_dict(_to_numpy_sd(model))

    rng = np.random.RandomState(2)
    a = rng.rand(3, 64, 64, 3).astype(np.float32)
    b = rng.rand(3, 64, 64, 3).astype(np.float32)

    with torch.no_grad():
        want = model(torch.from_numpy(a.transpose(0, 3, 1, 2)),
                     torch.from_numpy(b.transpose(0, 3, 1, 2)),
                     normalize=True).numpy()
    got = np.asarray(lpips_apply(params, jnp.asarray(a), jnp.asarray(b),
                                 normalize=True))
    assert got.shape == (3,)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_lpips_identical_images_zero():
    model = randomize_lpips_(TorchLPIPSAlex(), seed=1)
    params = import_lpips_state_dict(_to_numpy_sd(model))
    rng = np.random.RandomState(3)
    a = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    d = np.asarray(lpips_apply(params, a, a))
    np.testing.assert_allclose(d, 0.0, atol=1e-6)
