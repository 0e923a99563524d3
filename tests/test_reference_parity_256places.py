"""End-to-end demo parity vs the reference for the places2_256_freeform
suite (third of the reference's four golden example suites,
README.md:64-72) — same methodology as tests/test_reference_parity_e2e.py
(deterministic random weights flowed into both frameworks, composited PNGs
within 1 uint8), exercising the 256 model over JPEG inputs with
aspect-preserving resize (reference scripts/demo.py:48-53). The checked-in
inputs/goldens under tests/goldens/demo_places256 (fast gate,
tests/test_golden_regression.py) were generated with the same seed-0
weights this test verifies against the reference subprocess.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

import jax

REF_ROOT = "/root/reference"
INPUTS = os.path.join(os.path.dirname(__file__), "goldens",
                      "demo_places256", "inputs")
IMAGE_IDS = ("Places365_val_00000262", "Places365_val_00000267")

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference not mounted")]


def test_demo256_places_pixel_parity_vs_reference(tmp_path):
    import torch
    from migan_tpu.models.migan_inference import (
        GeneratorConfig, generator_init,
    )
    from migan_tpu.io.checkpoint import save_npz
    from migan_tpu.io.torch_import import export_migan_inference

    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from lib.model_zoo.migan_inference import Generator as RefG

    params = generator_init(jax.random.PRNGKey(0),
                            GeneratorConfig(resolution=256))
    npz = str(tmp_path / "w.npz")
    save_npz(npz, params)
    ref = RefG(resolution=256)
    sd = ref.state_dict()  # carries the fixed filter buffers
    for k, v in export_migan_inference(params).items():
        sd[k] = torch.from_numpy(np.ascontiguousarray(v))
    pt = str(tmp_path / "w.pt")
    torch.save(sd, pt)

    from migan_tpu.cli import demo

    out_jax = tmp_path / "out_jax"
    demo.main([
        "--model-name", "migan-256", "--model-path", npz,
        "--images-dir", os.path.join(INPUTS, "images"),
        "--masks-dir", os.path.join(INPUTS, "masks"),
        "--output-dir", str(out_jax),
    ])

    out_ref = tmp_path / "out_ref"
    proc = subprocess.run(
        [sys.executable, "-m", "scripts.demo",
         "--model-name", "migan-256", "--model-path", pt,
         "--images-dir", os.path.join(INPUTS, "images"),
         "--masks-dir", os.path.join(INPUTS, "masks"),
         "--output-dir", str(out_ref), "--device", "cpu"],
        cwd=REF_ROOT, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]

    for i in IMAGE_IDS:
        want = np.asarray(Image.open(out_ref / f"{i}.png"), np.int32)
        got = np.asarray(Image.open(out_jax / f"{i}.png"), np.int32)
        assert want.shape == got.shape, f"image {i}: shape mismatch"
        d = np.abs(want - got)
        assert d.max() <= 1, f"image {i}: max |diff| {d.max()}"
