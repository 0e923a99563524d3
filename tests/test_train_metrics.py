"""In-loop metric evaluation + best-FID checkpoint gating.

Drives train_stage through the snapshot.evaluate branch (reference
migan_default.py:462-490 metric eval every `snapshot.evaluate` ticks,
:139-146 best = lowest FID) on the 8-device CPU mesh with a random
Inception detector (eval.allow_random_detector, mirroring the evaluate
CLI's smoke switch): metric-*.jsonl written, Metrics/fid recorded in
stats.jsonl, single best checkpoint kept and overwritten by a lower FID.
Fast-tier: res-16 model, 4 eval items.
"""

import glob
import json
import os

import numpy as np
import pytest
from PIL import Image

from migan_tpu.train.loop import train_stage


@pytest.fixture()
def metric_cfg(tmp_path):
    droot = tmp_path / "data" / "train_256" / "a"
    droot.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(8):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
            droot / f"{i}.jpg")
    ds_cfg = {
        "name": "smoke_ds", "type": "places2",
        "root_dir": str(tmp_path / "data"),
        "mode": "train256",
        "loader": [{"type": "DefaultLoader", "args": {}}],
        "formatter": {"type": "FreeFormMaskFormatter",
                      "args": {"resolution": 16,
                               "random_flip": True,
                               "hole_range": [0.0, 1.0]}},
    }
    return {
        "env": {"rnd_seed": 0},
        "model_g": {
            "name": "smoke_g", "type": "migan_generator",
            "args": {
                "encoder": {"args": {"resolution": 16, "ic_n": 4,
                                     "depthwise": True,
                                     "reparametrize": True,
                                     "num_reparam_tensors": 2}},
                "synthesis": {"args": {"resolution": 16, "rgb_n": 3,
                                       "depthwise": True,
                                       "reparametrize": True,
                                       "num_reparam_tensors": 2}},
            },
        },
        "model_d": {
            "name": "smoke_d", "type": "migan_discriminator",
            "args": {"resolution": 16, "ic_n": 4, "depthwise": True,
                     "reparametrize": True, "num_reparam_tensors": 2},
        },
        "eval": {
            "dataset": ds_cfg,
            "batch_size": 4,
            "max_items": 4,
            "allow_random_detector": True,
        },
        "train": {
            "log_dir": str(tmp_path / "log"),
            "dataset": dict(ds_cfg),
            "batch_size": 8,
            "dataset_num_workers": 2,
            "loss_kwargs": {"r1_gamma": 10},
            "g_opt_kwargs": {"lr": 1e-3, "betas": [0, 0.99], "eps": 1e-8},
            "g_reg_interval": 4,
            "d_opt_kwargs": {"lr": 1e-3, "betas": [0, 0.99], "eps": 1e-8},
            "d_reg_interval": 2,
            "total_kimg": 1,
            "ema_kimg": 20,
            "kimg_per_tick": 0.008,   # tick every step
            "snapshot": {"image": 1000, "checkpoint": 1000, "evaluate": 1},
            "metrics": ["fid5k_full_inpainting"],
        },
    }


def test_metric_branch_and_best_checkpoint(metric_cfg):
    state = train_stage(metric_cfg, max_steps=3)
    assert int(state.step) == 3
    log_dir = metric_cfg["train"]["log_dir"]

    # metric jsonl: one record per evaluation tick (ticks 1 and 2)
    mpath = os.path.join(log_dir, "metric-fid5k_full_inpainting.jsonl")
    assert os.path.isfile(mpath)
    with open(mpath) as f:
        mrecs = [json.loads(l) for l in f]
    assert len(mrecs) == 2
    fids = [r["results"]["fid"] for r in mrecs]
    assert all(np.isfinite(f) and f >= 0 for f in fids)
    assert all(r["metric"] == "fid5k_full_inpainting" for r in mrecs)
    assert all(r["total_time"] > 0 for r in mrecs)

    # Metrics/fid lands in stats.jsonl (and the run log)
    with open(os.path.join(log_dir, "stats.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    fid_recs = [r for r in recs if "Metrics/fid" in r]
    assert [r["Metrics/fid"] for r in fid_recs] == fids

    # single best checkpoint, pointing at the arg-min FID step
    # (evals ran after steps 2 and 3)
    best_dir = os.path.join(log_dir, "weight", "best")
    steps = sorted(d for d in os.listdir(best_dir) if d.startswith("step_"))
    assert len(steps) == 1
    want_step = 2 if fids[0] <= fids[1] else 3
    assert steps[0] == f"step_{want_step:08d}"

    # real-feature disk cache created on tick 1, reused on tick 2
    assert glob.glob(os.path.join(log_dir, "fid-cache", "fid-stats-*.pkl"))

    # best checkpoint is restorable and standalone-extractable
    from migan_tpu.train import checkpoint as ckpt

    ema = ckpt.extract_field(os.path.join(best_dir, steps[0]))
    assert isinstance(ema, dict)


def test_metric_ctx_requires_weights_or_optin(metric_cfg, capsys):
    """Without weights or the random-detector opt-in, metrics are skipped
    with a log line (no crash) — the pre-round-5 default behavior."""
    from migan_tpu.train.loop import _build_metric_ctx

    metric_cfg["eval"].pop("allow_random_detector")
    assert _build_metric_ctx(metric_cfg) is None
    out = capsys.readouterr().out
    assert "skipping metric evaluation" in out

    metric_cfg["eval"]["allow_random_detector"] = True
    ctx = _build_metric_ctx(metric_cfg)
    assert ctx is not None and ctx["max_items"] == 4
    assert ctx["detector_tag"] == "inception-pytorch_fid"
