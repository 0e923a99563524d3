"""MI-GAN inference generator: structure, param count, and full-forward parity
with the reference PyTorch deployment net (random seeded weights).
"""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from migan_tpu.models.migan_inference import (
    GeneratorConfig, generator_init, generator_apply, count_params,
)

REF = "/root/reference"


@pytest.mark.parametrize("res,expected", [(256, 6_040_225), (512, 6_592_166)])
def test_param_count_matches_reference(res, expected):
    """Exact count vs BASELINE.md's measured reference numbers.

    Reference nn.Parameter counts are 5,943,617 (256) / 5,973,366 (512)
    (migan_inference.py:355). Our pytree excludes the reference's fixed
    filter conv weights (78,112 / 80,208 elements — not learnable,
    recomputed in ops) and includes the noise_const buffers (174,720 /
    699,008 elements — the reference registers them as buffers, we carry
    them as leaves). expected = ref_params - filter_params + noise_const,
    verified against the reference model directly."""
    cfg = GeneratorConfig(resolution=res)
    params = generator_init(jax.random.PRNGKey(0), cfg)
    assert count_params(params) == expected


def test_forward_shapes_and_fully_convolutional():
    cfg = GeneratorConfig(resolution=256)
    params = generator_init(jax.random.PRNGKey(0), cfg)
    fwd = jax.jit(lambda p, x: generator_apply(p, x, cfg))
    x = jnp.zeros((2, 256, 256, 4))
    y = fwd(params, x)
    assert y.shape == (2, 256, 256, 3)
    # fully convolutional: different spatial size, same params
    x2 = jnp.zeros((1, 128, 128, 4))
    y2 = fwd(params, x2)
    assert y2.shape == (1, 128, 128, 3)
    # non-square
    x3 = jnp.zeros((1, 128, 256, 4))
    y3 = fwd(params, x3)
    assert y3.shape == (1, 128, 256, 3)


@pytest.mark.parametrize("resolution", [64, 256])
@pytest.mark.slow
def test_forward_parity_vs_reference(resolution):
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        from lib.model_zoo.migan_inference import Generator as RefGenerator
    except Exception:
        pytest.skip("reference repo not available")

    from migan_tpu.io import import_migan_inference

    torch.manual_seed(0)
    ref = RefGenerator(resolution=resolution)
    # exercise the noise path: random noise strengths instead of init zeros
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if name.endswith("noise_strength"):
                p.copy_(torch.randn(()))
    ref.eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = import_migan_inference(sd)
    cfg = GeneratorConfig(resolution=resolution)

    rng = np.random.RandomState(1)
    img = rng.rand(2, resolution, resolution, 3).astype(np.float32) * 2 - 1
    mask = (rng.rand(2, resolution, resolution, 1) > 0.4).astype(np.float32)
    x = np.concatenate([mask - 0.5, img * mask], axis=-1)

    with torch.no_grad():
        want = ref(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    want = np.transpose(want.numpy(), (0, 2, 3, 1))

    got = np.asarray(generator_apply(params, jnp.asarray(x), cfg))
    assert got.shape == want.shape
    # f32 end-to-end through ~50 convs with clamp-256 activations
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)

    # import carried every learnable tensor (same count as the state_dict
    # minus fixed filter machinery)
    n_ref = sum(v.size for k, v in sd.items()
                if "filter" not in k)
    assert count_params(params) == n_ref
