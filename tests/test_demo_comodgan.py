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


def test_demo_cli_comodgan_z_injection_parity(tmp_path):
    """Cross-framework composite parity for the comodgan demo path:
    inject the SAME z into the reference Generator (its forward accepts
    z, reference comodgan.py:438-445) and into our CLI via --z-npy, run
    noise_mode='const' (imported noise buffers) both sides, and assert
    <=1-uint8 composite agreement — the same bar as the migan demo
    suites. The torch oracle replicates the reference demo's pre/post
    math verbatim (reference scripts/demo.py:50-66,122-141; 256-sq
    inputs, so the resize steps are identity)."""
    import sys

    import pytest

    torch = pytest.importorskip("torch")
    REF = "/root/reference"
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        from lib.model_zoo import comodgan as ref_cmg
    except Exception:
        pytest.skip("reference repo not available")

    from migan_tpu.cli import demo

    res, CH_BASE, CH_MAX = 256, 4096, 64
    torch.manual_seed(0)
    ref = ref_cmg.Generator(
        ref_cmg.Mapping(num_ws=14),
        ref_cmg.Encoder(resolution=res, ch_base=CH_BASE, ch_max=CH_MAX),
        ref_cmg.Synthesis(resolution=res, ch_base=CH_BASE, ch_max=CH_MAX))
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if name.endswith("noise_strength"):
                p.copy_(torch.randn(()) * 0.1)
    ref.eval()
    pt = str(tmp_path / "cmg.pt")
    torch.save(ref.state_dict(), pt)

    rng = np.random.RandomState(5)
    z = rng.randn(512).astype(np.float32)
    z_npy = str(tmp_path / "z.npy")
    np.save(z_npy, z)

    (tmp_path / "images").mkdir()
    (tmp_path / "masks").mkdir()
    img = (rng.rand(res, res, 3) * 255).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "images" / "a.png")
    mask = np.full((res, res), 255, np.uint8)
    mask[40:200, 64:220] = 0
    Image.fromarray(mask).convert("L").save(tmp_path / "masks" / "a.png")

    out = tmp_path / "out"
    demo.main([
        "--model-name", "comodgan-256", "--model-path", pt,
        "--images-dir", str(tmp_path / "images"),
        "--masks-dir", str(tmp_path / "masks"),
        "--output-dir", str(out),
        "--ch-base", str(CH_BASE), "--ch-max", str(CH_MAX),
        "--z-npy", z_npy, "--noise-mode", "const",
    ])
    got = np.asarray(Image.open(out / "a.png"), np.int32)

    # torch oracle: the reference demo loop with z injected
    m = (mask[:, :, None] // 255).astype(np.float32)
    timg = torch.tensor(img).float() * 2 / 255 - 1
    x = torch.cat([torch.tensor(m).float() - 0.5,
                   (timg * torch.tensor(m)).float()], dim=-1)
    x = x.permute(2, 0, 1).unsqueeze(0)
    with torch.no_grad():
        result = ref(x, torch.tensor(z).unsqueeze(0), noise_mode="const")[0]
    result = ((result * 0.5 + 0.5).clamp(0, 1) * 255).to(torch.uint8)
    result = result.permute(1, 2, 0).numpy()
    m8 = mask[:, :, None] // 255
    want = (img * m8 + result * (1 - m8)).astype(np.int32)

    d = np.abs(got - want)
    assert d.max() <= 1, f"composite parity: max |diff| {d.max()}"


def test_demo_cli_z_npy_shape_validated(tmp_path):
    """--z-npy with the wrong number of values must fail at load time with
    a clear message, not a shape error deep inside the jitted mapping net."""
    import pytest
    from migan_tpu.cli.demo import load_model

    z_npy = str(tmp_path / "bad_z.npy")
    np.save(z_npy, np.zeros((4, 512), np.float32))  # per-image latents
    with pytest.raises(SystemExit, match="512"):
        load_model("comodgan-256", "/nonexistent.npz", "float32",
                   z_npy=z_npy)
