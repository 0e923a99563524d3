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
    inception_apply, import_inception_state_dict,
)
from migan_tpu.evalx.lpips import lpips_apply, import_lpips_state_dict
from torch_oracles import (
    TorchFIDInception, TorchLPIPSAlex,
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
