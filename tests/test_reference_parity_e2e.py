"""End-to-end parity vs the reference, automated (was a manual runbook).

Two surfaces, both driven with the SAME deterministic random weights
(generator_init(PRNGKey(0), 256)) flowed into both frameworks:

  1. Demo CLI: our `migan_tpu.cli.demo` vs the reference `scripts/demo.py`
     (run as a subprocess on CPU from /root/reference) over reference
     example images — composited PNGs must agree within 1 uint8 level
     (reference demo loop: scripts/demo.py:122-141). Plus a golden-image
     regression against checked-in outputs (tests/goldens/demo_ffhq256),
     mirroring the reference's own examples/*/results golden strategy.

  2. App pipeline: `export.pipeline.make_pipeline` vs a torch oracle
     implementing the reference MIGAN_Pipeline tensor math verbatim
     (tests/torch_oracles.py; reference scripts/create_onnx_pipeline.py:
     119-264) around the reference's own generator — bbox crop, uint8
     resize quantization, the reference's (nonstandard) gaussian blur,
     feathered composite. Asserted to 1 uint8 overall and strictly inside
     the (eroded) hole.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

REF_ROOT = "/root/reference"
EXAMPLES = os.path.join(REF_ROOT, "examples", "ffhq_256_freeform")
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens",
                          "demo_ffhq256")
IMAGE_IDS = ("1", "2", "3", "4")

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(EXAMPLES), reason="reference examples not mounted")]


def _ref_path():
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)


@pytest.fixture(scope="module")
def weights(tmp_path_factory):
    """Deterministic random weights as native .npz + reference-loadable .pt."""
    import torch
    from migan_tpu.models.migan_inference import (
        GeneratorConfig, generator_init,
    )
    from migan_tpu.io.checkpoint import save_npz
    from migan_tpu.io.torch_import import export_migan_inference

    _ref_path()
    from lib.model_zoo.migan_inference import Generator as RefG

    d = tmp_path_factory.mktemp("weights")
    params = generator_init(jax.random.PRNGKey(0),
                            GeneratorConfig(resolution=256))
    npz = str(d / "w.npz")
    save_npz(npz, params)

    ref = RefG(resolution=256)
    sd = ref.state_dict()  # carries the fixed filter buffers
    for k, v in export_migan_inference(params).items():
        sd[k] = torch.from_numpy(np.ascontiguousarray(v))
    pt = str(d / "w.pt")
    torch.save(sd, pt)
    return {"npz": npz, "pt": pt, "params": params}


@pytest.fixture(scope="module")
def demo_inputs(tmp_path_factory):
    d = tmp_path_factory.mktemp("demo_in")
    (d / "images").mkdir()
    (d / "masks").mkdir()
    for i in IMAGE_IDS:
        for sub in ("images", "masks"):
            src = os.path.join(EXAMPLES, sub, f"{i}.png")
            (d / sub / f"{i}.png").write_bytes(open(src, "rb").read())
    return d


@pytest.fixture(scope="module")
def our_demo_out(weights, demo_inputs, tmp_path_factory):
    from migan_tpu.cli import demo

    out = tmp_path_factory.mktemp("demo_out_jax")
    demo.main([
        "--model-name", "migan-256", "--model-path", weights["npz"],
        "--images-dir", str(demo_inputs / "images"),
        "--masks-dir", str(demo_inputs / "masks"),
        "--output-dir", str(out),
    ])
    return out


def test_demo_pixel_parity_vs_reference(weights, demo_inputs, our_demo_out,
                                        tmp_path):
    out_ref = tmp_path / "out_ref"
    proc = subprocess.run(
        [sys.executable, "-m", "scripts.demo",
         "--model-name", "migan-256", "--model-path", weights["pt"],
         "--images-dir", str(demo_inputs / "images"),
         "--masks-dir", str(demo_inputs / "masks"),
         "--output-dir", str(out_ref), "--device", "cpu"],
        cwd=REF_ROOT, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]

    for i in IMAGE_IDS:
        want = np.asarray(Image.open(out_ref / f"{i}.png"), np.int32)
        got = np.asarray(Image.open(our_demo_out / f"{i}.png"), np.int32)
        d = np.abs(want - got)
        assert d.max() <= 1, f"image {i}: max |diff| {d.max()}"


def test_demo_golden_regression(our_demo_out):
    """Checked-in goldens pin the demo path end-to-end (weights init, ops,
    preprocessing, compositing). 1-level tolerance absorbs cross-platform
    float rounding. MIGAN_TPU_REGEN_GOLDENS=1 rewrites the goldens from
    the current outputs (run after importing real published weights —
    docs/REAL_WEIGHTS.md §3)."""
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


# ---------------------------------------------------------------------------
# App pipeline parity
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def pipelines(weights):
    import torch
    from torch_oracles import TorchPipelineOracle
    from migan_tpu.models.migan_inference import GeneratorConfig
    from migan_tpu.models.migan_fold import generator_apply_fast
    from migan_tpu.io.checkpoint import load_npz
    from migan_tpu.export.pipeline import make_pipeline

    _ref_path()
    from lib.model_zoo.migan_inference import Generator as RefG

    res = 256
    ref = RefG(resolution=res)
    ref.load_state_dict(torch.load(weights["pt"]))
    oracle = TorchPipelineOracle(ref, res)

    params = load_npz(weights["npz"])
    cfg = GeneratorConfig(resolution=res)
    pipe = make_pipeline(lambda x: generator_apply_fast(params, x, cfg), res)
    return oracle, pipe


def _compare_pipeline(oracle, pipe, img_u8, mask_u8):
    import torch
    from scipy import ndimage

    with torch.no_grad():
        want = oracle(
            torch.from_numpy(
                np.ascontiguousarray(img_u8.transpose(2, 0, 1)[None])),
            torch.from_numpy(np.ascontiguousarray(mask_u8[None, None])),
        ).numpy()[0].transpose(1, 2, 0)
    got = np.asarray(pipe(jnp.asarray(img_u8[None]),
                          jnp.asarray(mask_u8[None, :, :, None])))[0]
    d = np.abs(want.astype(np.int32) - got.astype(np.int32))
    hole = ndimage.binary_erosion(mask_u8 == 0, iterations=4)
    assert hole.any()
    assert d[hole].max() <= 1, f"inside hole: max |diff| {d[hole].max()}"
    assert d.max() <= 1, f"overall: max |diff| {d.max()}"


def test_pipeline_parity_native_res(pipelines):
    """256x256 input: crop == whole image (crop_size floor at res)."""
    oracle, pipe = pipelines
    img = np.asarray(Image.open(
        os.path.join(EXAMPLES, "images", "1.png")).convert("RGB"))
    mask = np.asarray(Image.open(
        os.path.join(EXAMPLES, "masks", "1.png")).convert("L")).copy()
    mask[mask < 255] = 0  # demo binarize rule (scripts/demo.py:44)
    _compare_pipeline(oracle, pipe, img, mask)


def test_pipeline_parity_large_image(pipelines):
    """384x512 input with a rect hole: real bbox crop + downscale path."""
    oracle, pipe = pipelines
    img = np.asarray(Image.open(
        os.path.join(EXAMPLES, "images", "2.png"))
        .convert("RGB").resize((512, 384), Image.BICUBIC))
    mask = np.full((384, 512), 255, np.uint8)
    mask[100:200, 160:300] = 0
    _compare_pipeline(oracle, pipe, img, mask)
