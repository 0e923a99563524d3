"""Training-time MI-GAN nets: parity vs the reference torch implementation
(dw+reparam student variant and plain baseline), param counts, grads.
"""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from migan_tpu.models.migan import (
    MiganConfig, generator_init, generator_apply,
    discriminator_init, discriminator_apply, count_params,
)

REF = "/root/reference"


def _ref_modules(resolution, depthwise, reparametrize, num_reparam_tensors):
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        from lib.model_zoo.migan import (
            Encoder as RefEncoder, Synthesis as RefSynthesis,
            Generator as RefGenerator, Discriminator as RefDiscriminator,
        )
    except Exception:
        pytest.skip("reference repo not available")
    torch.manual_seed(0)
    kw = dict(resolution=resolution, depthwise=depthwise,
              reparametrize=reparametrize,
              num_reparam_tensors=num_reparam_tensors)
    enc = RefEncoder(ic_n=4, **kw)
    syn = RefSynthesis(rgb_n=3, **kw)
    g = RefGenerator(enc, syn)
    d = RefDiscriminator(ic_n=4, **kw)
    return torch, g, d


@pytest.mark.parametrize("depthwise,reparam,n_tensors", [
    (True, True, 9),    # the shipped student config (migan_dw_reparam_*)
    (False, False, 4),  # plain baseline (migan_g256 topology at low res)
])
def test_generator_parity_vs_reference(depthwise, reparam, n_tensors):
    torch, ref_g, _ = _ref_modules(64, depthwise, reparam, n_tensors)
    from migan_tpu.io import import_migan_train

    with torch.no_grad():
        for name, p in ref_g.named_parameters():
            if name.endswith("noise_strength"):
                p.copy_(torch.randn(()))
    ref_g.eval()

    cfg = MiganConfig(resolution=64, depthwise=depthwise,
                      reparametrize=reparam, num_reparam_tensors=n_tensors)
    sd = {k: v.detach().numpy() for k, v in ref_g.state_dict().items()}
    params = import_migan_train(sd)

    rng = np.random.RandomState(3)
    x = rng.randn(2, 64, 64, 4).astype(np.float32)
    with torch.no_grad():
        want, want_inter = ref_g(
            torch.tensor(np.transpose(x, (0, 3, 1, 2))),
            noise_mode="const", return_intermediate_outputs=True)
    want = np.transpose(want.numpy(), (0, 2, 3, 1))

    got, got_inter = generator_apply(params, jnp.asarray(x), cfg,
                                     noise_mode="const",
                                     return_intermediate=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)

    # KD consumes per-resolution torgb outputs — check one mid resolution
    for res in (8, 32):
        w = np.transpose(want_inter["res_to_rgb"][res].numpy(), (0, 2, 3, 1))
        g = np.asarray(got_inter["res_to_rgb"][res])
        np.testing.assert_allclose(g, w, rtol=1e-3, atol=1e-3)

    # every learnable tensor imported
    n_ref = sum(v.size for k, v in sd.items() if "resample_filter" not in k)
    assert count_params(params) == n_ref


@pytest.mark.slow
def test_discriminator_parity_vs_reference():
    torch, _, ref_d = _ref_modules(64, True, True, 9)
    from migan_tpu.io import import_migan_train

    ref_d.eval()
    cfg = MiganConfig(resolution=64, depthwise=True, reparametrize=True,
                      num_reparam_tensors=9)
    sd = {k: v.detach().numpy() for k, v in ref_d.state_dict().items()}
    params = import_migan_train(sd)

    rng = np.random.RandomState(4)
    x = rng.randn(8, 64, 64, 4).astype(np.float32)
    with torch.no_grad():
        want = ref_d(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    got = np.asarray(discriminator_apply(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_param_counts_match_baseline_md():
    """BASELINE.md: training G (dw+reparam x9, 256) = 52,686,881 params;
    training D (256) = 28,864,257. Ours counts the same learnable tensors
    (resample_filter buffers excluded — they are computed, and they are
    registered buffers, not parameters, in the reference too)."""
    cfg_g = MiganConfig(resolution=256, depthwise=True, reparametrize=True,
                        num_reparam_tensors=9)
    g = generator_init(jax.random.PRNGKey(0), cfg_g)

    def learnable(tree, prefix=""):
        """torch counts nn.Parameters only; noise_const is a buffer there."""
        n = 0
        for k, v in tree.items():
            if isinstance(v, dict):
                n += learnable(v)
            elif k != "noise_const":
                n += int(np.prod(v.shape))
        return n

    assert learnable(g) == 52_686_881

    # BASELINE.md's 28,864,257 is the *plain* D (migan_d256, the variant the
    # shipped experiment configs train with); the dw+reparam D measures
    # 39,002,835 on the reference. D has no noise buffers.
    cfg_d = MiganConfig(resolution=256, depthwise=False, reparametrize=False)
    d = discriminator_init(jax.random.PRNGKey(1), cfg_d)
    assert count_params(d) == 28_864_257

    cfg_d2 = MiganConfig(resolution=256, depthwise=True, reparametrize=True,
                         num_reparam_tensors=9)
    d2 = discriminator_init(jax.random.PRNGKey(1), cfg_d2)
    assert count_params(d2) == 39_002_835


@pytest.mark.slow
def test_generator_grads_finite():
    cfg = MiganConfig(resolution=32, depthwise=True, reparametrize=True,
                      num_reparam_tensors=2)
    params = generator_init(jax.random.PRNGKey(0), cfg)
    x = jnp.ones((2, 32, 32, 4))

    def loss(p):
        img = generator_apply(p, x, cfg, noise_mode="random",
                              rng=jax.random.PRNGKey(5))
        return jnp.mean(img ** 2)

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)
