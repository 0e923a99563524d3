"""End-to-end demo parity vs the reference at 512 — the places2_512
suite (the second of the reference's golden example suites,
README.md:73-86). Same methodology as test_reference_parity_e2e.py
(deterministic random weights flowed into both frameworks; composited
PNGs within 1 uint8), exercising the 512 model, JPEG inputs, and
non-square aspect-preserving resize (reference scripts/demo.py:48-53).
"""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

import jax

REF_ROOT = "/root/reference"
EXAMPLES = os.path.join(REF_ROOT, "examples", "places2_512_freeform")
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens",
                          "demo_places512")
IMAGE_IDS = ("Places365_val_00001629", "Places365_val_00006343")

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(EXAMPLES), reason="reference examples not mounted")]


@pytest.fixture(scope="module")
def weights(tmp_path_factory):
    import torch
    from migan_tpu.models.migan_inference import (
        GeneratorConfig, generator_init,
    )
    from migan_tpu.io.checkpoint import save_npz
    from migan_tpu.io.torch_import import export_migan_inference

    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from lib.model_zoo.migan_inference import Generator as RefG

    d = tmp_path_factory.mktemp("weights512")
    params = generator_init(jax.random.PRNGKey(0),
                            GeneratorConfig(resolution=512))
    npz = str(d / "w.npz")
    save_npz(npz, params)

    ref = RefG(resolution=512)
    sd = ref.state_dict()  # carries the fixed filter buffers
    for k, v in export_migan_inference(params).items():
        sd[k] = torch.from_numpy(np.ascontiguousarray(v))
    pt = str(d / "w.pt")
    torch.save(sd, pt)
    return {"npz": npz, "pt": pt}


@pytest.fixture(scope="module")
def demo_inputs(tmp_path_factory):
    d = tmp_path_factory.mktemp("demo512_in")
    (d / "images").mkdir()
    (d / "masks").mkdir()
    for i in IMAGE_IDS:
        src = os.path.join(EXAMPLES, "images", f"{i}.jpg")
        (d / "images" / f"{i}.jpg").write_bytes(open(src, "rb").read())
        src = os.path.join(EXAMPLES, "masks", f"{i}.png")
        (d / "masks" / f"{i}.png").write_bytes(open(src, "rb").read())
    return d


@pytest.fixture(scope="module")
def our_demo_out(weights, demo_inputs, tmp_path_factory):
    from migan_tpu.cli import demo

    out = tmp_path_factory.mktemp("demo512_out_jax")
    demo.main([
        "--model-name", "migan-512", "--model-path", weights["npz"],
        "--images-dir", str(demo_inputs / "images"),
        "--masks-dir", str(demo_inputs / "masks"),
        "--output-dir", str(out),
    ])
    return out


def test_demo512_pixel_parity_vs_reference(weights, demo_inputs,
                                           our_demo_out, tmp_path):
    out_ref = tmp_path / "out_ref"
    proc = subprocess.run(
        [sys.executable, "-m", "scripts.demo",
         "--model-name", "migan-512", "--model-path", weights["pt"],
         "--images-dir", str(demo_inputs / "images"),
         "--masks-dir", str(demo_inputs / "masks"),
         "--output-dir", str(out_ref), "--device", "cpu"],
        cwd=REF_ROOT, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]

    for i in IMAGE_IDS:
        want = np.asarray(Image.open(out_ref / f"{i}.png"), np.int32)
        got = np.asarray(Image.open(our_demo_out / f"{i}.png"), np.int32)
        assert want.shape == got.shape, f"image {i}: shape mismatch"
        d = np.abs(want - got)
        assert d.max() <= 1, f"image {i}: max |diff| {d.max()}"


def test_demo512_golden_regression(our_demo_out):
    """MIGAN_TPU_REGEN_GOLDENS=1 rewrites goldens (docs/REAL_WEIGHTS.md §3)."""
    if os.environ.get("MIGAN_TPU_REGEN_GOLDENS") == "1":
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for i in IMAGE_IDS:
            Image.open(our_demo_out / f"{i}.png").save(
                os.path.join(GOLDEN_DIR, f"{i}.png"))
        pytest.skip("goldens regenerated")
    for i in IMAGE_IDS:
        want = np.asarray(Image.open(os.path.join(GOLDEN_DIR, f"{i}.png")),
                          np.int32)
        got = np.asarray(Image.open(our_demo_out / f"{i}.png"), np.int32)
        d = np.abs(want - got)
        assert d.max() <= 1, f"golden {i}: max |diff| {d.max()}"


OBJECT_EXAMPLES = os.path.join(REF_ROOT, "examples", "places2_512_object")
OBJECT_IDS = ("1", "13")


def test_demo512_invert_mask_parity_vs_reference(weights, tmp_path):
    """The reference's fourth golden suite (places2_512_object,
    README.md:80-86) runs with --invert-mask (object masks are 1=hole);
    exercises the mask-inversion branch of read_mask end to end
    (reference scripts/demo.py:26-45)."""
    ins = tmp_path / "in"
    (ins / "images").mkdir(parents=True)
    (ins / "masks").mkdir()
    for i in OBJECT_IDS:
        for sub, ext in (("images", "png"), ("masks", "png")):
            src = os.path.join(OBJECT_EXAMPLES, sub, f"{i}.{ext}")
            (ins / sub / f"{i}.{ext}").write_bytes(open(src, "rb").read())

    from migan_tpu.cli import demo

    out_jax = tmp_path / "out_jax"
    demo.main([
        "--model-name", "migan-512", "--model-path", weights["npz"],
        "--images-dir", str(ins / "images"),
        "--masks-dir", str(ins / "masks"),
        "--invert-mask",
        "--output-dir", str(out_jax),
    ])

    out_ref = tmp_path / "out_ref"
    proc = subprocess.run(
        [sys.executable, "-m", "scripts.demo",
         "--model-name", "migan-512", "--model-path", weights["pt"],
         "--images-dir", str(ins / "images"),
         "--masks-dir", str(ins / "masks"),
         "--invert-mask",
         "--output-dir", str(out_ref), "--device", "cpu"],
        cwd=REF_ROOT, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]

    for i in OBJECT_IDS:
        want = np.asarray(Image.open(out_ref / f"{i}.png"), np.int32)
        got = np.asarray(Image.open(out_jax / f"{i}.png"), np.int32)
        assert want.shape == got.shape, f"image {i}: shape mismatch"
        d = np.abs(want - got)
        assert d.max() <= 1, f"image {i}: max |diff| {d.max()}"
