"""Golden-image regression for ALL FOUR reference example suites —
reference-mount-independent (fast gate).

Mirrors the reference's examples/*/results golden strategy
(reference README.md:56-86) with inputs AND goldens checked in under
tests/goldens/<suite>/: the demo CLI runs deterministic random weights
(generator_init(PRNGKey(0), res) — the same seed the slow torch-subprocess
parity suites prove ≤1-uint8 equal to the reference demo,
tests/test_reference_parity_e2e.py / _512.py) over the committed example
inputs, and outputs must match the committed goldens within 1 uint8.

MIGAN_TPU_REGEN_GOLDENS=1 rewrites goldens from current outputs (run after
importing real published weights — docs/REAL_WEIGHTS.md §3).
"""

import os

import numpy as np
import pytest
from PIL import Image

import jax

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")

# suite dir -> (model name, resolution, image ids+ext, extra demo flags)
SUITES = {
    "demo_ffhq256": ("migan-256", 256,
                     [("1", "png"), ("2", "png"), ("3", "png"),
                      ("4", "png")], []),
    "demo_places256": ("migan-256", 256,
                       [("Places365_val_00000262", "jpg"),
                        ("Places365_val_00000267", "jpg")], []),
    "demo_places512": ("migan-512", 512,
                       [("Places365_val_00001629", "jpg"),
                        ("Places365_val_00006343", "jpg")], []),
    # object masks are 1=hole: exercises --invert-mask
    # (reference scripts/demo.py:26-45)
    "demo_places512_object": ("migan-512", 512,
                              [("1", "png"), ("13", "png")],
                              ["--invert-mask"]),
}


@pytest.fixture(scope="module")
def weights_npz(tmp_path_factory):
    from migan_tpu.models.migan_inference import (
        GeneratorConfig, generator_init,
    )
    from migan_tpu.io.checkpoint import save_npz

    d = tmp_path_factory.mktemp("golden_w")
    out = {}
    for res in (256, 512):
        params = generator_init(jax.random.PRNGKey(0),
                                GeneratorConfig(resolution=res))
        out[res] = str(d / f"w{res}.npz")
        save_npz(out[res], params)
    return out


@pytest.mark.parametrize("suite", sorted(SUITES))
def test_demo_golden_suite(suite, weights_npz, tmp_path):
    from migan_tpu.cli import demo

    model, res, ids, flags = SUITES[suite]
    sdir = os.path.join(GOLDENS, suite)
    out = tmp_path / "out"
    demo.main([
        "--model-name", model, "--model-path", weights_npz[res],
        "--images-dir", os.path.join(sdir, "inputs", "images"),
        "--masks-dir", os.path.join(sdir, "inputs", "masks"),
        "--output-dir", str(out), *flags,
    ])

    if os.environ.get("MIGAN_TPU_REGEN_GOLDENS") == "1":
        for stem, _ in ids:
            Image.open(out / f"{stem}.png").save(
                os.path.join(sdir, f"{stem}.png"))
        pytest.skip("goldens regenerated")

    for stem, _ in ids:
        want = np.asarray(Image.open(os.path.join(sdir, f"{stem}.png")),
                          np.int32)
        got = np.asarray(Image.open(out / f"{stem}.png"), np.int32)
        assert want.shape == got.shape, f"{suite}/{stem}: shape mismatch"
        d = np.abs(want - got)
        assert d.max() <= 1, f"{suite}/{stem}: max |diff| {d.max()}"
