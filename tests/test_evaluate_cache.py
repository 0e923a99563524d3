"""Evaluate CLI --real-acts-cache: identical metrics with/without the
cached real-image Inception activations (they are model-independent;
caching them is the CLI analog of the training metrics stack's dataset
stats cache, evalx/metrics.py::compute_feature_stats_for_dataset)."""

import os

import numpy as np
import pytest
from PIL import Image

import jax

pytestmark = pytest.mark.slow  # compiles the 256 generator + detectors


def test_real_acts_cache_roundtrip(tmp_path, capsys):
    from migan_tpu.cli import evaluate
    from migan_tpu.io.checkpoint import save_npz
    from migan_tpu.models.migan_inference import (GeneratorConfig,
                                                  generator_init)

    real_dir = tmp_path / "reals"
    real_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (256, 256, 3),
                                    np.uint8)).save(real_dir / f"{i}.png")
    wpath = str(tmp_path / "w.npz")
    save_npz(wpath, generator_init(jax.random.PRNGKey(0),
                                   GeneratorConfig(resolution=256)))

    cache = str(tmp_path / "real_acts.npz")
    args = ["--model-name", "migan-256", "--model-path", wpath,
            "--real-dir", str(real_dir), "--batch-size", "2",
            "--allow-random-detector",
            "--real-acts-cache", cache]
    fid1, lp1 = evaluate.main(args)
    assert os.path.isfile(cache)
    out1 = capsys.readouterr().out
    assert "cached real activations ->" in out1

    fid2, lp2 = evaluate.main(args)
    out2 = capsys.readouterr().out
    assert "real activations from cache" in out2
    # same masks (seed-0 protocol re-seeded per main()), same generator,
    # cached vs recomputed real acts -> identical numbers
    assert fid1 == pytest.approx(fid2, rel=1e-9)
    assert lp1 == pytest.approx(lp2, rel=1e-12)

    # stale cache (wrong item count) is ignored, not used
    np.savez(cache, acts=np.zeros((7, 2048), np.float32))
    fid3, _ = evaluate.main(args)
    out3 = capsys.readouterr().out
    assert "ignoring" in out3
    assert fid3 == pytest.approx(fid1, rel=1e-6)
