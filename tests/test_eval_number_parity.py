"""End-to-end FID + LPIPS NUMBER parity vs the reference eval protocol.

The north-star target is "FID/LPIPS within 1% of the PyTorch reference"
(BASELINE.md). Detector *activation* parity is proven in
test_detector_parity.py; this test closes the remaining gap by comparing
the FINAL METRIC NUMBERS end to end:

  torch side  — a verbatim re-run of the reference evaluation loop
                (reference scripts/evaluate_fid_lpips.py:177-270): the
                reference's own MIGAN inference generator, the
                pytorch_fid-flavor InceptionV3 + LPIPS-alex oracles
                (tests/torch_oracles.py), np.mean/np.cov + scipy sqrtm
                Frechet distance — all NCHW torch.
  jax side    — our `migan_tpu.cli.evaluate.main` (the production CLI,
                data-parallel over the virtual device mesh) fed the SAME
                images, masks, generator weights, and detector weights.

Everything is deterministic random weights flowed through both stacks
(the methodology of test_reference_parity_e2e.py), so the <1% assertion
holds for the published weights the day they are supplied to the same
importers.
"""

import os
import sys

import numpy as np
import pytest
from PIL import Image

import jax

REF_ROOT = "/root/reference"

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference not mounted")]

# 64 images: enough to exercise the f64 streaming mean/cov and the
# shard-extend sampler non-degenerately (a 10-image FID has a
# near-singular covariance); still CPU-tractable for the torch oracle.
N_IMAGES = 64
RES = 256


def _ref_path():
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)


@pytest.fixture(scope="module")
def eval_setup(tmp_path_factory):
    """images/, masks/, generator weights (npz + reference .pt), detector
    state_dict .pth files — one deterministic bundle used by both stacks."""
    import torch
    from migan_tpu.data.masks import random_mask_uint8
    from migan_tpu.models.migan_inference import (
        GeneratorConfig, generator_init,
    )
    from migan_tpu.io.checkpoint import save_npz
    from migan_tpu.io.torch_import import export_migan_inference
    from torch_oracles import (
        TorchFIDInception, TorchLPIPSAlex,
        randomize_inception_, randomize_lpips_,
    )

    _ref_path()
    from lib.model_zoo.migan_inference import Generator as RefG

    d = tmp_path_factory.mktemp("eval_parity")
    img_dir, mask_dir = d / "images", d / "masks"
    img_dir.mkdir(), mask_dir.mkdir()

    # Smooth synthetic images (low-res noise upsampled BICUBIC) so the
    # inception activations live in a natural-image-like regime rather
    # than white noise.
    rng = np.random.RandomState(0)
    for i in range(N_IMAGES):
        low = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
        img = Image.fromarray(low).resize((RES, RES), Image.BICUBIC)
        img.save(img_dir / f"{i:03d}.png")
        mask = random_mask_uint8(RES, hole_range=(0.1, 0.5),
                                 rng=np.random.RandomState(100 + i))
        Image.fromarray(mask).convert("L").save(mask_dir / f"{i:03d}.png")

    params = generator_init(jax.random.PRNGKey(0),
                            GeneratorConfig(resolution=RES))
    npz = str(d / "g.npz")
    save_npz(npz, params)
    ref_g = RefG(resolution=RES)
    sd = ref_g.state_dict()  # keeps the fixed filter/noise buffers
    for k, v in export_migan_inference(params).items():
        sd[k] = torch.from_numpy(np.ascontiguousarray(v))
    gen_pt = str(d / "g.pt")
    torch.save(sd, gen_pt)

    inc = randomize_inception_(TorchFIDInception(), seed=0)
    lp = randomize_lpips_(TorchLPIPSAlex(), seed=0)
    inc_pth, lp_pth = str(d / "inception.pth"), str(d / "lpips.pth")
    torch.save(inc.state_dict(), inc_pth)
    torch.save(lp.state_dict(), lp_pth)

    return {"dir": d, "images": img_dir, "masks": mask_dir, "npz": npz,
            "gen_pt": gen_pt, "inc_pth": inc_pth, "lp_pth": lp_pth,
            "inc": inc, "lp": lp}


def _torch_reference_eval(setup):
    """The reference evaluation loop, verbatim semantics
    (scripts/evaluate_fid_lpips.py:163-267): dataset item construction,
    composite, LPIPS(normalize=True), inception pool features,
    np.mean/np.cov -> scipy-sqrtm Frechet distance."""
    import torch
    from scipy import linalg

    _ref_path()
    from lib.model_zoo.migan_inference import Generator as RefG

    model = RefG(resolution=RES)
    model.load_state_dict(torch.load(setup["gen_pt"], weights_only=True))
    model.eval()

    xs, imgs, masks = [], [], []
    for p in sorted(setup["images"].iterdir()):
        img = Image.open(p).convert("RGB")
        mask = Image.open(setup["masks"] / f"{p.stem}.png").convert("L")
        img_t = torch.Tensor(np.array(img)).float() * 2 / 255 - 1
        mask_t = torch.Tensor(
            np.array(mask)[:, :, np.newaxis] // 255).float()
        img_t = img_t.permute(2, 0, 1)
        mask_t = mask_t.permute(2, 0, 1)
        xs.append(torch.cat([mask_t - 0.5, img_t * mask_t], dim=0))
        imgs.append(img_t)
        masks.append(mask_t)
    x, imgs_t, masks_t = (torch.stack(xs), torch.stack(imgs),
                          torch.stack(masks))

    with torch.no_grad():
        out = model(x)
    composed = masks_t * imgs_t + (1 - masks_t) * out
    imgs01 = (imgs_t * 0.5 + 0.5).clamp(0, 1)
    comp01 = (composed * 0.5 + 0.5).clamp(0, 1)

    with torch.no_grad():
        lpips_vals = setup["lp"](imgs01, comp01, normalize=True).numpy()
        real_acts = setup["inc"](imgs01).numpy()
        fake_acts = setup["inc"](comp01).numpy()

    mu_r, sig_r = np.mean(real_acts, 0), np.cov(real_acts, rowvar=False)
    mu_f, sig_f = np.mean(fake_acts, 0), np.cov(fake_acts, rowvar=False)
    diff = mu_r - mu_f
    covmean, _ = linalg.sqrtm(sig_r.dot(sig_f), disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    fid = float(diff.dot(diff) + np.trace(sig_r) + np.trace(sig_f)
                - 2 * np.trace(covmean))
    return fid, float(np.mean(lpips_vals)), real_acts, fake_acts


def test_fid_lpips_number_parity(eval_setup):
    from migan_tpu.cli import evaluate

    want_fid, want_lpips, _, _ = _torch_reference_eval(eval_setup)

    got_fid, got_lpips = evaluate.main([
        "--model-name", "migan-256", "--model-path", eval_setup["npz"],
        "--real-dir", str(eval_setup["images"]),
        "--mask-dir", str(eval_setup["masks"]),
        "--batch-size", "5",
        "--inception-weights", eval_setup["inc_pth"],
        "--lpips-weights", eval_setup["lp_pth"],
    ])

    assert want_fid > 0 and got_fid > 0
    assert abs(got_fid - want_fid) / want_fid < 0.01, (got_fid, want_fid)
    assert abs(got_lpips - want_lpips) / abs(want_lpips) < 0.01, (
        got_lpips, want_lpips)
