"""Coverage for the small utility + CLI surfaces: training_stats moments
(reference torch_utils/training_stats.py), the param-summary printer
(reference torch_utils/misc.py print_module_summary), the print_log tee
(reference lib/log_service.py), and the generate_masks CLI
(reference scripts/generate_masks.py)."""

import numpy as np
from PIL import Image

from migan_tpu.utils.stats import StatsRegistry, Collector
from migan_tpu.utils.summary import (param_count, param_sum,
                                     print_param_summary)
from migan_tpu.utils import logging as mlog


def test_stats_moments_and_collector():
    reg = StatsRegistry()
    col = Collector(regex=r"Loss/.*", registry=reg)
    vals = [1.0, 2.0, 3.0, 4.0]
    for v in vals:
        reg.report("Loss/G/loss", v)
    reg.report("Progress/kimg", 7.0)          # filtered out by the regex
    reg.report("Loss/D/loss", [float("nan"), 5.0])  # non-finite dropped
    col.update()
    assert set(col.names()) == {"Loss/G/loss", "Loss/D/loss"}
    assert col.mean("Loss/G/loss") == np.mean(vals)
    assert np.isclose(col.std("Loss/G/loss"), np.std(vals))
    d = col.as_dict()
    assert d["Loss/G/loss"]["num"] == len(vals)
    assert d["Loss/D/loss"]["num"] == 1 and d["Loss/D/loss"]["mean"] == 5.0
    # second interval: only new reports appear
    reg.report("Loss/G/loss", 10.0)
    col.update()
    assert col.mean("Loss/G/loss") == 10.0
    assert np.isnan(col.mean("Loss/D/loss"))  # nothing new this interval


def test_param_summary():
    tree = {"encoder": {"b8": {"w": np.zeros((3, 3, 4, 8)),
                               "b": np.ones((8,))}},
            "synthesis": {"w": np.full((2, 2), 2.0)}}
    n = param_count(tree)
    assert n == 3 * 3 * 4 * 8 + 8 + 4
    assert param_sum(tree) == 8 + 4 * 2.0
    lines = []
    total = print_param_summary(tree, "toy", print_fn=lines.append)
    assert total == n
    text = "\n".join(lines)
    assert "encoder.b8" in text and f"{n:,}" in text


def test_print_log_tee(tmp_path):
    log = tmp_path / "logs" / "train.log"
    mlog.set_log_file(str(log))
    try:
        mlog.print_log("hello", 123)
        mlog.print_log("second line")
    finally:
        mlog.set_log_file(None)
    body = log.read_text()
    assert "hello 123\n" in body and body.endswith("second line\n")


def test_profiled_function_runs():
    @mlog.profiled_function
    def f(a, b):
        return a + b

    assert f(2, 3) == 5 and f.__name__ == "f"


def test_generate_masks_cli(tmp_path):
    from migan_tpu.cli.generate_masks import main

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    for name in ("a", "b"):
        Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(
            imgs / f"{name}.png")

    out1 = tmp_path / "m1"
    main(["--out-dir", str(out1), "--img-dir", str(imgs),
          "--resolution", "64", "--seed", "3"])
    assert sorted(p.name for p in out1.iterdir()) == ["a.png", "b.png"]
    m = np.asarray(Image.open(out1 / "a.png"))
    assert m.shape == (64, 64) and set(np.unique(m)) <= {0, 255}

    # deterministic per seed
    out2 = tmp_path / "m2"
    main(["--out-dir", str(out2), "--img-dir", str(imgs),
          "--resolution", "64", "--seed", "3"])
    np.testing.assert_array_equal(np.asarray(Image.open(out1 / "b.png")),
                                  np.asarray(Image.open(out2 / "b.png")))

    # anonymous --count mode
    out3 = tmp_path / "m3"
    main(["--out-dir", str(out3), "--count", "3", "--resolution", "32"])
    assert len(list(out3.iterdir())) == 3


def test_create_pipeline_cli(tmp_path):
    """End-to-end smoke of the app-pipeline CLI (reference
    scripts/create_onnx_pipeline.py analog): bucketed + polymorphic
    StableHLO exports land on disk and the self-check inpaints a sample."""
    import jax
    from migan_tpu.cli.create_pipeline import main
    from migan_tpu.models.migan_inference import (GeneratorConfig,
                                                  generator_init)
    from migan_tpu.io.checkpoint import save_npz

    w = tmp_path / "w.npz"
    save_npz(str(w), generator_init(jax.random.PRNGKey(0),
                                    GeneratorConfig(resolution=256)))
    imgs = tmp_path / "imgs"
    masks = tmp_path / "masks"
    imgs.mkdir(), masks.mkdir()
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (200, 180, 3), np.uint8)).save(
        imgs / "s.jpg")
    m = np.full((200, 180), 255, np.uint8)
    m[60:120, 50:130] = 0
    Image.fromarray(m).save(masks / "s.png")

    out = tmp_path / "out"
    main(["--resolution", "256", "--model-path", str(w),
          "--images-dir", str(imgs), "--masks-dir", str(masks),
          "--output-dir", str(out), "--buckets", "256",
          "--polymorphic"])
    assert (out / "models" / "migan_pipeline_256.stablehlo").stat().st_size
    assert (out / "models" / "migan_pipeline_dynamic.stablehlo").stat(
        ).st_size
    res = np.asarray(Image.open(out / "sample_results" / "s.png"))
    assert res.shape == (200, 180, 3)
    # outside the hole the pipeline composites the original back
    orig = np.asarray(Image.open(imgs / "s.jpg"))
    np.testing.assert_array_equal(res[:40, :40], orig[:40, :40])


def test_calculate_flops_migan256(capsys):
    """The XLA-cost-analysis FLOP counter runs and lands in the expected
    band for migan-256 (reference conv-only count ~21.8 GF at bs=1;
    whole-graph XLA count is slightly above — BASELINE.md)."""
    from migan_tpu.cli.calculate_flops import main

    main(["--models", "migan-256", "--batch", "1"])
    out = capsys.readouterr().out
    assert "migan-256" in out
    import re

    m = re.search(r"migan-256[^0-9]*([0-9.]+)", out)
    gf = float(m.group(1))
    assert 15.0 < gf < 40.0, out


def test_bench_probe_backend_cpu(monkeypatch):
    """bench._probe_backend succeeds against a working (CPU-forced) backend
    — the fail-fast guard must not false-positive when devices are fine."""
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "")
    import bench

    assert bench._probe_backend(timeout_s=180) is True


def test_bench_retry_once_semantics():
    """_retry_once protects the round-end artifact from one-off tunnel
    RPC errors: exactly one retry for transient failures, none for OOMs
    (deterministic + expensive recompiles), second failure propagates."""
    import bench

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("socket closed mid-flight")
        return 42.0

    assert bench._retry_once(flaky, "t") == 42.0
    assert calls["n"] == 2

    oom_calls = {"n": 0}

    def oom():
        oom_calls["n"] += 1
        raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory allocating")

    import pytest

    with pytest.raises(RuntimeError):
        bench._retry_once(oom, "t")
    assert oom_calls["n"] == 1  # not retried

    def always_bad():
        raise ValueError("transient-looking but persistent")

    with pytest.raises(ValueError):
        bench._retry_once(always_bad, "t")
