"""Demo CLI smoke for the Co-Mod-GAN model names — the reference demo
supports migan-* AND comodgan-* (reference scripts/demo.py:96-110); this
covers our `load_comodgan_forward` branch end to end (npz load, jitted
forward with per-call z sampling, postprocess/composite).

Cross-framework pixel parity is impossible here (the comodgan demo path
samples z internally, so outputs are RNG-dependent); the architecture
itself is parity-tested in test_comodgan.py. This test asserts the CLI
contract: output exists at input size, known region is preserved exactly
by the composite, and the hole region was actually painted.
"""

import numpy as np
from PIL import Image

import jax


def test_demo_cli_comodgan256(tmp_path):
    from migan_tpu.models.comodgan import CoModGANConfig, generator_init
    from migan_tpu.io.checkpoint import save_npz
    from migan_tpu.cli import demo

    # Small channel banks keep the 79M-param full net out of a smoke test;
    # the loader accepts any npz whose tree matches the config geometry.
    params = generator_init(
        jax.random.PRNGKey(0),
        CoModGANConfig(resolution=256, ch_base=4096, ch_max=64))
    npz = str(tmp_path / "cmg.npz")
    save_npz(npz, params)

    (tmp_path / "images").mkdir()
    (tmp_path / "masks").mkdir()
    rng = np.random.RandomState(0)
    img = (rng.rand(256, 256, 3) * 255).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "images" / "a.png")
    mask = np.full((256, 256), 255, np.uint8)
    mask[64:192, 64:192] = 0  # center hole (0 = hole, reference convention)
    Image.fromarray(mask).convert("L").save(tmp_path / "masks" / "a.png")

    out = tmp_path / "out"
    demo.main([
        "--model-name", "comodgan-256", "--model-path", npz,
        "--images-dir", str(tmp_path / "images"),
        "--masks-dir", str(tmp_path / "masks"),
        "--output-dir", str(out),
        "--ch-base", "4096", "--ch-max", "64",
    ])

    got = np.asarray(Image.open(out / "a.png"))
    assert got.shape == (256, 256, 3)
    known = mask == 255
    assert np.array_equal(got[known], img[known]), "known region must be kept"
    hole = ~known
    assert not np.array_equal(got[hole], img[hole]), "hole must be painted"
