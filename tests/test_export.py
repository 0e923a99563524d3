"""Export: reparam fold parity, StableHLO round-trip, app pipeline."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from migan_tpu.models.migan import MiganConfig, generator_init, generator_apply
from migan_tpu.models.migan_inference import (
    GeneratorConfig, generator_apply as inf_apply,
)
from migan_tpu.export.fold import fold_generator, fold_diff_statistic
from migan_tpu.export import stablehlo
from migan_tpu.export.pipeline import make_pipeline, get_masked_bbox


CFG = MiganConfig(resolution=64, depthwise=True, reparametrize=True,
                  num_reparam_tensors=3)


def _train_params():
    params = generator_init(jax.random.PRNGKey(0), CFG)

    # non-zero noise strengths so the fold covers the noise path
    def walk(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v)
            elif k == "noise_strength":
                tree[k] = jnp.asarray(0.3)
    walk(params)
    return params


@pytest.mark.slow
def test_fold_matches_training_net():
    """The folded inference net must reproduce train-G(noise_mode='const')
    (reference export_inference_model.py:132-164 expects ~0% diff)."""
    params = _train_params()
    rng = np.random.RandomState(0)
    mask = (rng.rand(2, 64, 64, 1) > 0.4).astype(np.float32)
    img = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    x = jnp.asarray(np.concatenate([mask - 0.5, img * mask], axis=-1))

    pct = fold_diff_statistic(params, CFG, x)
    assert pct < 0.5, f"fold diff {pct}% too high"

    folded = fold_generator(params, CFG)
    icfg = GeneratorConfig(resolution=64)
    want = np.asarray(generator_apply(params, x, CFG, noise_mode="const"))
    got = np.asarray(inf_apply(folded, x, icfg))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_stablehlo_roundtrip():
    params = _train_params()
    folded = fold_generator(params, CFG)
    icfg = GeneratorConfig(resolution=64)

    def fwd(x):
        return inf_apply(folded, x, icfg)

    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 4),
                    jnp.float32)
    data = stablehlo.export_fn(fwd, [x])
    assert isinstance(data, bytes) and len(data) > 1000
    restored = stablehlo.load_fn(data)
    np.testing.assert_allclose(np.asarray(restored(x)), np.asarray(fwd(x)),
                               rtol=1e-5, atol=1e-5)


def test_bbox_covers_hole():
    mask = np.full((1, 200, 300, 1), 255, np.uint8)
    mask[0, 50:80, 100:160, 0] = 0
    box = get_masked_bbox(jnp.asarray(mask), res=64, padding=16, h=200,
                          w=300)
    x_min, x_max, y_min, y_max = [int(b) for b in box]
    assert x_min <= 100 and x_max >= 160
    assert y_min <= 50 and y_max >= 80
    assert (x_max - x_min) >= 64 and (y_max - y_min) >= 64
    assert 0 <= x_min and x_max <= 300 and 0 <= y_min and y_max <= 200


def test_pipeline_end_to_end():
    params = _train_params()
    folded = fold_generator(params, CFG)
    icfg = GeneratorConfig(resolution=64)

    pipeline = make_pipeline(lambda x: inf_apply(folded, x, icfg),
                             resolution=64, padding=16)
    rng = np.random.RandomState(2)
    image = rng.randint(0, 255, (1, 128, 160, 3), np.uint8)
    mask = np.full((1, 128, 160, 1), 255, np.uint8)
    mask[0, 40:70, 60:100, 0] = 0
    out = np.asarray(pipeline(jnp.asarray(image), jnp.asarray(mask)))
    assert out.shape == image.shape and out.dtype == np.uint8
    # known pixels far from the hole are untouched
    np.testing.assert_array_equal(out[0, :5, :5], image[0, :5, :5])
    # hole region actually changed
    assert (out[0, 45:65, 70:90] != image[0, 45:65, 70:90]).any()


def test_pipeline_no_hole_is_identity():
    params = _train_params()
    folded = fold_generator(params, CFG)
    icfg = GeneratorConfig(resolution=64)
    pipeline = make_pipeline(lambda x: inf_apply(folded, x, icfg),
                             resolution=64, padding=16)
    image = np.random.RandomState(3).randint(0, 255, (1, 128, 128, 3),
                                             np.uint8)
    mask = np.full((1, 128, 128, 1), 255, np.uint8)
    out = np.asarray(pipeline(jnp.asarray(image), jnp.asarray(mask)))
    # fully-known mask: feathered m ~ 1 everywhere -> image unchanged up to
    # the float32 epsilon of the normalized gaussian + uint8 truncation
    # (the reference ONNX pipeline truncates identically)
    assert np.abs(out.astype(int) - image.astype(int)).max() <= 1


def test_pipeline_polymorphic_export():
    """One StableHLO program with symbolic H/W (the reference ONNX dynamic
    axes analog) must bit-match the jitted pipeline at several concrete
    shapes, including non-aligned ones."""
    import jax.numpy as jnp
    from migan_tpu.export import stablehlo

    def gen(x):  # stub generator at res 64 — the pipeline is under test
        return jnp.tanh(x[..., 1:4] * 0.1)

    pipeline = make_pipeline(gen, resolution=64)
    img = jnp.zeros((1, 128, 160, 3), jnp.uint8)
    mask = jnp.full((1, 128, 160, 1), 255, jnp.uint8)
    data = stablehlo.export_fn(
        pipeline, [img, mask],
        polymorphic_shapes=["1, h, w, 3", "1, h, w, 1"],
        constraints=["h >= 8", "w >= 8"])
    fn = stablehlo.load_fn(data)
    # includes a side in [res, res+4) and a side below the model res —
    # shape classes the reference's ONNX dynamic axes serve
    for h, w in [(160, 160), (140, 133), (65, 200), (48, 96)]:
        rng = np.random.RandomState(h)
        i = rng.randint(0, 255, (1, h, w, 3)).astype(np.uint8)
        m = np.full((1, h, w, 1), 255, np.uint8)
        m[0, 20:40, 30:60] = 0
        got = np.asarray(fn(jnp.asarray(i), jnp.asarray(m)))
        want = np.asarray(pipeline(jnp.asarray(i), jnp.asarray(m)))
        np.testing.assert_array_equal(got, want)


def test_export_cli_from_checkpoint_dir(tmp_path):
    """The export CLI accepts an orbax checkpoint dir as --model-path
    (log/<run>/weight), resolves the newest committed step, folds its
    params_G_ema, and writes migan.npz + migan.stablehlo — the exact
    checkpoint->deployable flow of the training demonstration
    (docs/TRAINING_DEMO.md)."""
    from PIL import Image

    from migan_tpu.cli import export as export_cli
    from migan_tpu.train import checkpoint as ckpt
    from migan_tpu.train.train_step import TrainConfig, init_train_state
    from migan_tpu.io.checkpoint import load_npz

    state = init_train_state(jax.random.PRNGKey(0), CFG, CFG,
                             TrainConfig(batch_size=4))
    wdir = tmp_path / "weight"
    ckpt.save(str(wdir), 3, state)
    # a torn temp dir from a crash must not confuse resolution
    (wdir / "step_00000009.orbax-checkpoint-tmp").mkdir()

    img_dir = tmp_path / "imgs"
    mask_dir = tmp_path / "masks"
    img_dir.mkdir(), mask_dir.mkdir()
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(
        img_dir / "a.png")
    Image.fromarray(
        (rng.rand(64, 64) > 0.3).astype(np.uint8) * 255).convert("L").save(
        mask_dir / "a.png")

    out = tmp_path / "out"
    export_cli.main([
        "--model-path", str(wdir), "--resolution", "64",
        "--num-reparam-tensors", "3",
        "--origs-dir", str(img_dir), "--masks-dir", str(mask_dir),
        "--output-dir", str(out), "--num-samples", "0",
    ])
    folded = load_npz(str(out / "models" / "migan.npz"))
    assert "synthesis" in folded and "encoder" in folded
    assert (out / "models" / "migan.stablehlo").exists()
