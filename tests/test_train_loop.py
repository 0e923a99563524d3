"""End-to-end train_stage smoke on the CPU mesh (tiny config, few steps)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # loop-level integration; each test compiles full XLA programs
from PIL import Image

from migan_tpu.train.loop import train_stage


@pytest.fixture()
def smoke_cfg(tmp_path):
    droot = tmp_path / "data" / "train_256" / "a"
    droot.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(8):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
            droot / f"{i}.jpg")
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
        "train": {
            "log_dir": str(tmp_path / "log"),
            "dataset": {
                "name": "smoke_ds", "type": "places2",
                "root_dir": str(tmp_path / "data"),
                "mode": "train256",
                "loader": [{"type": "DefaultLoader", "args": {}}],
                "formatter": {"type": "FreeFormMaskFormatter",
                              "args": {"resolution": 16,
                                       "random_flip": True,
                                       "hole_range": [0.0, 1.0]}},
            },
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
            "snapshot": {"image": 2, "checkpoint": 2, "evaluate": 1000},
            "metrics": [],
        },
    }


def test_train_stage_smoke(smoke_cfg):
    import glob
    import json

    state = train_stage(smoke_cfg, max_steps=3)
    assert int(state.step) == 3
    log_dir = smoke_cfg["train"]["log_dir"]
    assert os.path.isfile(os.path.join(log_dir, "stats.jsonl"))
    with open(os.path.join(log_dir, "stats.jsonl")) as f:
        lines = f.readlines()
    assert len(lines) >= 2
    # resource telemetry in the tick record (reference Resources/* stats)
    rec = json.loads(lines[0])
    assert "Resources/cpu_mem_gb" in rec and rec["Resources/cpu_mem_gb"] > 0
    # checkpoint written at a tick boundary
    wdir = os.path.join(log_dir, "weight")
    assert os.path.isdir(wdir) and len(os.listdir(wdir)) >= 1
    # raw + composited snapshot sheets (reference fakes*.png + *_combined)
    assert glob.glob(os.path.join(log_dir, "fakes*_combined.png"))
    # tensorboard event file (reference migan_default.py:578-585 sink)
    assert glob.glob(os.path.join(log_dir, "events.out.tfevents.*"))


def test_train_stage_steps_per_call(smoke_cfg):
    """steps_per_call=2 drives the loop through make_fused_train_step:
    same tick/stats/checkpoint surface, k steps per dispatch."""
    import json

    smoke_cfg["train"]["steps_per_call"] = 2
    smoke_cfg["train"]["log_dir"] = smoke_cfg["train"]["log_dir"] + "_spc"
    state = train_stage(smoke_cfg, max_steps=4)
    assert int(state.step) == 4
    log_dir = smoke_cfg["train"]["log_dir"]
    with open(os.path.join(log_dir, "stats.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    assert recs and all(np.isfinite(r["Loss/G/loss"]["mean"]) for r in recs)
    # R1 stats reported only for steps where it ran (interval 2 -> every
    # other step: per tick of 1 call = 2 steps, num == 1, not 2)
    assert any("Loss/r1_penalty" in r for r in recs)
    r1_recs = [r for r in recs if "Loss/r1_penalty" in r]
    assert all(r["Loss/r1_penalty"]["num"] <= 1.0 for r in r1_recs)


def test_train_stage_with_real_kd_teacher(smoke_cfg, tmp_path):
    """End-to-end KD: a real (tiny) Co-Mod-GAN teacher saved to .npz is
    auto-loaded by the loop (reference loss.py:55-121 teacher1_path) and
    the per-resolution distillation term reaches stats.jsonl."""
    import json

    import jax

    from migan_tpu.models import comodgan
    from migan_tpu.io.checkpoint import save_npz

    tcfg = comodgan.CoModGANConfig(resolution=16)
    tparams = comodgan.generator_init(jax.random.PRNGKey(7), tcfg)
    tpath = str(tmp_path / "teacher.npz")
    save_npz(tpath, tparams)

    smoke_cfg["train"]["log_dir"] = smoke_cfg["train"]["log_dir"] + "_kd"
    smoke_cfg["train"]["image_level_kd_kwargs"] = {
        "use_image_level_kd": True,
        "start_resolution": 8,
        "weight": 2.0,
        "inference_resolution": 16,
        "teacher1_path": tpath,
    }
    state = train_stage(smoke_cfg, max_steps=2)
    assert int(state.step) == 2
    log_dir = smoke_cfg["train"]["log_dir"]
    with open(os.path.join(log_dir, "stats.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    kd = [r for r in recs if "Loss/G/kd_l1_image_level_loss" in r]
    assert kd and all(
        np.isfinite(r["Loss/G/kd_l1_image_level_loss"]["mean"]) for r in kd)


def test_train_stage_resume(smoke_cfg, capsys):
    """Orbax full-state resume through the loop surface: run 2 steps,
    restart with resume_path, continue to 4 — step/nimg continue, no
    re-init (reference resume_path / load_sd capability)."""
    state1 = train_stage(smoke_cfg, max_steps=2)
    assert int(state1.step) == 2
    wdir = os.path.join(smoke_cfg["train"]["log_dir"], "weight")
    assert os.path.isdir(wdir)

    smoke_cfg["train"]["resume_path"] = wdir
    state2 = train_stage(smoke_cfg, max_steps=4)
    out = capsys.readouterr().out
    assert "resumed from" in out
    assert int(state2.step) == 4
    assert int(state2.nimg) == 4 * smoke_cfg["train"]["batch_size"]


def test_train_stage_resume_stream_exact(smoke_cfg, tmp_path):
    """Kill+resume replays EXACTLY the uninterrupted run (stronger than the
    reference, which restarted its data order and noise stream on resume,
    migan_default.py:309-312,387-396): the data pipeline is addressed by
    absolute batch index and per-step noise keys are fold_in(key, step), so
    a 2-step run resumed to 4 steps must be BITWISE identical to a straight
    4-step run — params, EMA, and Adam moments."""
    import copy

    import jax

    cfg_a = copy.deepcopy(smoke_cfg)
    cfg_a["train"]["log_dir"] = str(tmp_path / "log_straight")
    state_a = train_stage(cfg_a, max_steps=4)

    cfg_b = copy.deepcopy(smoke_cfg)
    cfg_b["train"]["log_dir"] = str(tmp_path / "log_resumed")
    train_stage(cfg_b, max_steps=2)
    cfg_b2 = copy.deepcopy(cfg_b)
    cfg_b2["train"]["resume_path"] = os.path.join(
        cfg_b["train"]["log_dir"], "weight")
    # different worker count on the resumed leg: per-item RNG is position-
    # addressed, so this must not change the stream
    cfg_b2["train"]["dataset_num_workers"] = 3
    state_b = train_stage(cfg_b2, max_steps=4)

    assert int(state_a.step) == int(state_b.step) == 4
    for name, tree_a, tree_b in (
            ("params_G", state_a.params_G, state_b.params_G),
            ("params_G_ema", state_a.params_G_ema, state_b.params_G_ema),
            ("params_D", state_a.params_D, state_b.params_D),
            ("opt_G", state_a.opt_G, state_b.opt_G),
            ("opt_D", state_a.opt_D, state_b.opt_D)):
        la = jax.tree_util.tree_leaves(tree_a)
        lb = jax.tree_util.tree_leaves(tree_b)
        assert len(la) == len(lb), name
        for a, b in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=name)


def test_checkpoint_latest_skips_torn_orbax_tmp(tmp_path):
    """A kill mid-save leaves an orbax temp dir that sorts AFTER the last
    committed step; latest() must ignore it (found live: SIGKILL during
    the tick-20 checkpoint of the training demonstration left
    step_00005376.orbax-checkpoint-tmp next to committed step_00004352)."""
    from migan_tpu.train import checkpoint as ckpt

    d = tmp_path / "weight"
    d.mkdir()
    (d / "step_00004352").mkdir()
    (d / "step_00005376.orbax-checkpoint-tmp").mkdir()
    assert ckpt.latest(str(d)).endswith("step_00004352")
    (d / "step_00005376").mkdir()
    assert ckpt.latest(str(d)).endswith("step_00005376")


def test_checkpoint_extract_field(tmp_path):
    """Template-free EMA extraction from a checkpoint dir (what the export
    CLI uses when handed log/<run>/weight): same tree as the saved
    params_G_ema, no model construction."""
    import jax
    from migan_tpu.models.migan import MiganConfig
    from migan_tpu.train import checkpoint as ckpt
    from migan_tpu.train.train_step import TrainConfig, init_train_state

    cfg = MiganConfig(resolution=16, depthwise=True, reparametrize=True,
                      num_reparam_tensors=2)
    state = init_train_state(jax.random.PRNGKey(0), cfg, cfg,
                             TrainConfig(batch_size=4))
    path = ckpt.save(str(tmp_path / "weight"), 7, state)
    ema = ckpt.extract_field(path)
    want = jax.tree_util.tree_leaves(state.params_G_ema)
    got = jax.tree_util.tree_leaves(ema)
    assert len(want) == len(got)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
    assert int(ckpt.extract_field(path, "step")) == 0  # state.step, not 7
    with pytest.raises(ValueError):
        ckpt.extract_field(path, "nope")
