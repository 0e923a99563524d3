"""Co-Mod-GAN / StyleGAN2: forward parity vs the reference torch nets.

Uses small channel banks (ch_base=4096) at resolution 256 — the reference
Synthesis hardcodes num_ws for 256/512 only (reference comodgan.py:371-374),
so 256 is the smallest testable resolution.
"""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REF = "/root/reference"

torch = pytest.importorskip("torch")
if REF not in sys.path:
    sys.path.insert(0, REF)
try:
    from lib.model_zoo import comodgan as ref_cmg
    from lib.model_zoo import stylegan as ref_sg
except Exception:
    pytest.skip("reference repo not available", allow_module_level=True)

from migan_tpu.models.comodgan import (
    CoModGANConfig, generator_init, generator_apply,
)
from migan_tpu.models.stylegan import (
    MappingConfig, mapping_apply, StyleGANConfig,
    discriminator_apply as sg_discriminator_apply,
)
from migan_tpu.io import import_migan_train


CH_BASE, CH_MAX = 4096, 64


def _build_ref_generator(resolution=256):
    torch.manual_seed(0)
    mapping = ref_cmg.Mapping(num_ws=14 if resolution == 256 else 16)
    encoder = ref_cmg.Encoder(resolution=resolution, ch_base=CH_BASE,
                              ch_max=CH_MAX)
    synthesis = ref_cmg.Synthesis(resolution=resolution, ch_base=CH_BASE,
                                  ch_max=CH_MAX)
    g = ref_cmg.Generator(mapping, encoder, synthesis)
    with torch.no_grad():
        for name, p in g.named_parameters():
            if name.endswith("noise_strength"):
                p.copy_(torch.randn(()) * 0.1)
    g.eval()
    return g


def test_comodgan_generator_parity():
    res = 256
    ref = _build_ref_generator(res)
    cfg = CoModGANConfig(resolution=res, ch_base=CH_BASE, ch_max=CH_MAX)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = import_migan_train(sd)

    rng = np.random.RandomState(11)
    img = rng.rand(2, res, res, 3).astype(np.float32) * 2 - 1
    mask = (rng.rand(2, res, res, 1) > 0.4).astype(np.float32)
    x = np.concatenate([mask - 0.5, img * mask], axis=-1)
    z = rng.randn(2, 512).astype(np.float32)

    with torch.no_grad():
        want, want_inter = ref(
            torch.tensor(np.transpose(x, (0, 3, 1, 2))), torch.tensor(z),
            noise_mode="const", return_intermediate_outs=True)
    want = np.transpose(want.numpy(), (0, 2, 3, 1))

    got, got_inter = generator_apply(
        params, jnp.asarray(x), cfg, z=jnp.asarray(z), noise_mode="const",
        return_intermediate=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)

    for r in (8, 64):
        w = np.transpose(want_inter["res_to_rgb"][r].numpy(), (0, 2, 3, 1))
        g = np.asarray(got_inter["res_to_rgb"][r])
        np.testing.assert_allclose(g, w, rtol=2e-3, atol=2e-3)

    n_ref = sum(v.size for k, v in sd.items() if "resample_filter" not in k)
    from migan_tpu.models.migan import count_params
    assert count_params(params) == n_ref


def test_comodgan_param_count_matches_baseline():
    """BASELINE.md: Co-Mod-GAN-256 generator = 79,177,378 params (torch
    nn.Parameters; excludes noise_const/w_avg buffers and resample filters)."""
    cfg = CoModGANConfig(resolution=256)
    params = generator_init(jax.random.PRNGKey(0), cfg)

    def learnable(tree):
        n = 0
        for k, v in tree.items():
            if isinstance(v, dict):
                n += learnable(v)
            elif k not in ("noise_const", "w_avg"):
                n += int(np.prod(v.shape))
        return n

    assert learnable(params) == 79_177_378


def test_comodgan_512_param_count():
    """BASELINE.md: Co-Mod-GAN-512 generator = 79,792,231 params."""
    cfg = CoModGANConfig(resolution=512)
    assert cfg.num_ws == 16
    params = generator_init(jax.random.PRNGKey(0), cfg)

    def learnable(tree):
        n = 0
        for k, v in tree.items():
            if isinstance(v, dict):
                n += learnable(v)
            elif k not in ("noise_const", "w_avg"):
                n += int(np.prod(v.shape))
        return n

    assert learnable(params) == 79_792_231


def test_mapping_truncation_and_parity():
    torch.manual_seed(1)
    ref = ref_sg.Mapping(num_ws=14)
    with torch.no_grad():
        ref.w_avg.copy_(torch.randn(512))
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = import_migan_train(sd)
    cfg = MappingConfig(num_ws=14)

    z = np.random.RandomState(2).randn(3, 512).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(z), None, truncation_psi=0.7).numpy()
    got = np.asarray(mapping_apply(params, jnp.asarray(z), cfg,
                                   truncation_psi=0.7))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_stylegan_discriminator_parity():
    torch.manual_seed(3)
    ref = ref_sg.Discriminator(resolution=64, ic_n=4, ch_base=CH_BASE,
                               ch_max=CH_MAX, use_fp16_before_res=None)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = import_migan_train(sd)
    cfg = StyleGANConfig(resolution=64, ic_n=4, ch_base=CH_BASE,
                         ch_max=CH_MAX)
    x = np.random.RandomState(4).randn(8, 64, 64, 4).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(np.transpose(x, (0, 3, 1, 2))), None).numpy()
    got = np.asarray(sg_discriminator_apply(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
