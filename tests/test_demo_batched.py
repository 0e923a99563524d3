"""Batched serving path of the demo CLI (`--batch-size > 1`).

The reference demo (reference: scripts/demo.py:122-141) is a strictly
per-image loop; the batched path is a beyond-reference serving mode that
dispatches [B, res, res, 4] batches with host decode/encode on a thread
pool overlapped with device compute. The generator is fully convolutional
with no cross-batch ops, so outputs must match the per-image loop — this
asserts equality within the 1-uint8 rounding convention used by the
cross-framework parity suites (bs=1 and bs=B compile separately, so XLA
may order float ops differently).
"""

import numpy as np
from PIL import Image

import jax

import pytest


@pytest.fixture(scope="module")
def demo_inputs(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("batched_demo")
    from migan_tpu.models.migan_inference import (GeneratorConfig,
                                                  generator_init)
    from migan_tpu.io.checkpoint import save_npz

    npz = str(tmp_path / "w.npz")
    save_npz(npz, generator_init(jax.random.PRNGKey(0),
                                 GeneratorConfig(resolution=256)))

    (tmp_path / "images").mkdir()
    (tmp_path / "masks").mkdir()
    rng = np.random.RandomState(0)
    # 5 images with batch 2 -> 3 dispatches incl. a zero-padded tail;
    # varied sizes exercise the aspect-preserving resize paths.
    sizes = [(256, 256), (300, 200), (256, 256), (120, 380), (256, 257)]
    for i, (w, h) in enumerate(sizes):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / "images" / f"im{i}.png")
        mask = np.full((h, w), 255, np.uint8)
        mask[h // 4: 3 * h // 4, w // 4: 3 * w // 4] = 0
        Image.fromarray(mask).convert("L").save(
            tmp_path / "masks" / f"im{i}.png")
    return tmp_path, npz


def _run(tmp_path, npz, out_name, extra):
    from migan_tpu.cli import demo

    out = tmp_path / out_name
    demo.main([
        "--model-name", "migan-256", "--model-path", npz,
        "--images-dir", str(tmp_path / "images"),
        "--masks-dir", str(tmp_path / "masks"),
        "--output-dir", str(out),
    ] + extra)
    return out


@pytest.mark.slow
def test_batched_matches_per_image(demo_inputs):
    tmp_path, npz = demo_inputs
    out1 = _run(tmp_path, npz, "out_bs1", [])
    outb = _run(tmp_path, npz, "out_bs2", ["--batch-size", "2",
                                           "--io-workers", "4"])

    names = sorted(p.name for p in out1.iterdir())
    assert names == sorted(p.name for p in outb.iterdir())
    assert len(names) == 5
    for name in names:
        a = np.asarray(Image.open(out1 / name)).astype(np.int16)
        b = np.asarray(Image.open(outb / name)).astype(np.int16)
        d = np.abs(a - b).max()
        assert d <= 1, f"{name}: max |diff| {d}"


@pytest.mark.slow
def test_batched_exact_batch_multiple(demo_inputs, tmp_path):
    """No tail padding: 5 images at batch 5 (single dispatch)."""
    src, npz = demo_inputs
    from migan_tpu.cli import demo

    out = tmp_path / "out_bs5"
    demo.main([
        "--model-name", "migan-256", "--model-path", npz,
        "--images-dir", str(src / "images"),
        "--masks-dir", str(src / "masks"),
        "--output-dir", str(out),
        "--batch-size", "5",
    ])
    assert len(list(out.iterdir())) == 5


def test_run_batched_function_res64(tmp_path):
    """Fast-suite coverage of the batching/padding/overlap machinery:
    run_batched at res 64 (cheap compiles) vs a per-image loop on the
    same forward fn, byte-identical (same compiled [2,...] program is
    avoided on the per-image side by slicing a [1,...] call — tolerance
    1 uint8 as in the parity suites)."""
    import jax.numpy as jnp
    from migan_tpu.models.migan_inference import (GeneratorConfig,
                                                  generator_init)
    from migan_tpu.models.migan_fold import generator_apply_fast
    from migan_tpu.cli.demo import run_batched
    from migan_tpu.data.preprocess import (preprocess, postprocess,
                                           read_mask, resize_max)

    cfg = GeneratorConfig(resolution=64)
    params = generator_init(jax.random.PRNGKey(1), cfg)

    @jax.jit
    def forward(x):
        return generator_apply_fast(params, x, cfg).astype(jnp.float32)

    (tmp_path / "images").mkdir()
    (tmp_path / "masks").mkdir()
    rng = np.random.RandomState(3)
    for i in range(5):
        img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / "images" / f"im{i}.png")
        mask = np.full((64, 64), 255, np.uint8)
        mask[16:48, 16:48] = 0
        Image.fromarray(mask).convert("L").save(
            tmp_path / "masks" / f"im{i}.png")

    out = tmp_path / "out"
    out.mkdir()
    paths = sorted(str(p) for p in (tmp_path / "images").iterdir())
    n = run_batched(forward, 64, paths, tmp_path / "masks", out,
                    batch_size=2, io_workers=3)
    assert n == 5

    for p in paths:
        from pathlib import Path as _P

        stem = _P(p).stem
        img_r = resize_max(Image.open(p).convert("RGB"), max_size=64)
        mask_r = resize_max(read_mask(str(tmp_path / "masks" /
                                          f"{stem}.png")),
                            max_size=64, interpolation=Image.NEAREST)
        x = preprocess(img_r, mask_r, 64)
        y = np.asarray(forward(x))[0]
        want = np.asarray(postprocess(y, img_r, mask_r)).astype(np.int16)
        got = np.asarray(Image.open(out / f"{stem}.png")).astype(np.int16)
        d = np.abs(got - want).max()
        assert d <= 1, f"{stem}: max |diff| {d}"
