"""Config banks: macro expansion, inheritance, CLI-level helpers."""

import numpy as np
import pytest

from migan_tpu.utils.config import ConfigBanks, split_batch, cfg_to_debug


@pytest.fixture(scope="module")
def banks():
    return ConfigBanks("configs")


def test_model_bank_inheritance(banks):
    cfg = banks.model("migan_dw_reparam_e512")
    assert cfg["type"] == "migan_encoder"
    assert cfg["args"]["resolution"] == 512
    assert cfg["args"]["depthwise"] is True
    assert cfg["args"]["num_reparam_tensors"] == 9
    # inherited from the base entry
    assert cfg["args"]["ch_base"] == 32768
    assert cfg["args"]["activation"].startswith("lrelu_agc")


def test_model_macro_expansion(banks):
    cfg = banks.model("migan_dw_reparam_g256")
    assert cfg["args"]["encoder"]["type"] == "migan_encoder"
    assert cfg["args"]["synthesis"]["args"]["resolution"] == 256


def test_experiment_bank(banks):
    cfg = banks.experiment("migan_places512")
    assert cfg["model_g"]["args"]["synthesis"]["args"]["resolution"] == 512
    assert cfg["train"]["dataset"]["type"] == "places2"
    assert cfg["train"]["dataset"]["mode"] == "train512"
    assert cfg["train"]["total_kimg"] == 25000
    assert cfg["train"]["g_reg_interval"] == 4
    assert cfg["train"]["d_reg_interval"] == 16
    assert cfg["train"]["image_level_kd_kwargs"]["weight"] == 2.0
    assert cfg["eval"]["dataset"]["mode"] == "val512"


def test_registry_builds_from_bank(banks):
    import jax
    from migan_tpu.models.registry import get_model, count_params

    cfg = banks.model("migan_dw_reparam_g256")
    # shrink for test speed
    cfg["args"]["encoder"]["args"]["resolution"] = 64
    cfg["args"]["synthesis"]["args"]["resolution"] = 64
    handle = get_model()(cfg)
    params = handle.init(jax.random.PRNGKey(0))
    y = handle.apply(params, np.zeros((1, 64, 64, 4), np.float32),
                     noise_mode="const")
    assert y.shape == (1, 64, 64, 3)


def test_split_batch():
    sec = {"batch_size": 32, "batch_size_per_device": None}
    split_batch(sec, 8)
    assert sec["batch_size_per_device"] == 4
    sec = {"batch_size": None, "batch_size_per_device": 2}
    split_batch(sec, 4)
    assert sec["batch_size"] == 8
    with pytest.raises(ValueError):
        split_batch({"batch_size": 30, "batch_size_per_device": None}, 8)


def test_cfg_to_debug(banks):
    cfg = banks.experiment("migan_places256")
    cfg = cfg_to_debug(cfg)
    assert cfg["train"]["experiment_id"] == 999999999999
    assert cfg["train"]["batch_size_per_device"] == 2


def test_apply_overrides():
    """Dotted-path --set overrides, YAML-parsed values, list indexing,
    intermediate-dict creation (cfg_helper.py:269-380 capability)."""
    from migan_tpu.utils.config import apply_overrides

    cfg = {"train": {"g_opt_kwargs": {"lr": 1e-3, "betas": [0.0, 0.99]},
                     "batch_size": 32}}
    apply_overrides(cfg, [
        "train.g_opt_kwargs.lr=1e-4",
        "train.g_opt_kwargs.betas.1=0.5",
        "train.batch_size=8",
        "train.new_section.flag=true",
        "env.rnd_seed=7",
    ])
    assert cfg["train"]["g_opt_kwargs"]["lr"] == 1e-4
    assert cfg["train"]["g_opt_kwargs"]["betas"] == [0.0, 0.5]
    assert cfg["train"]["batch_size"] == 8
    assert cfg["train"]["new_section"]["flag"] is True
    assert cfg["env"]["rnd_seed"] == 7

    import pytest

    with pytest.raises(ValueError):
        apply_overrides(cfg, ["no_equals_sign"])


@pytest.mark.parametrize("name,ref_name,total_kimg", [
    ("migan_places256", "migan_places256", 50000),
    ("migan_places512", "migan_places512", 25000),
])
def test_experiment_hyperparams_match_reference(banks, name, ref_name,
                                                total_kimg):
    """The training hyperparameters in our experiment bank must equal the
    reference's (configs/experiment/*.yaml) — the schedule IS the parity
    contract for reproducing the published models."""
    import os

    import yaml

    cfg = banks.experiment(name)["train"]
    ref_path = f"/root/reference/configs/experiment/{ref_name}.yaml"
    if not os.path.isfile(ref_path):
        pytest.skip("reference configs not mounted")
    with open(ref_path) as f:
        ref = yaml.safe_load(f)["train"]

    assert cfg["batch_size"] == ref["batch_size"] == 32
    for side in ("g_opt_kwargs", "d_opt_kwargs"):
        assert cfg[side]["lr"] == ref[side]["lr"]
        assert list(cfg[side]["betas"]) == list(ref[side]["betas"])
        assert float(cfg[side]["eps"]) == float(ref[side]["eps"])
    assert cfg["g_reg_interval"] == ref["g_reg_interval"] == 4
    assert cfg["d_reg_interval"] == ref["d_reg_interval"] == 16
    assert cfg["loss_kwargs"]["r1_gamma"] == ref["loss_kwargs"]["r1_gamma"]
    assert cfg["total_kimg"] == ref["total_kimg"] == total_kimg
    assert cfg["ema_kimg"] == ref["ema_kimg"]
    assert cfg["kimg_per_tick"] == ref["kimg_per_tick"]
    kd, rkd = cfg["image_level_kd_kwargs"], ref["image_level_kd_kwargs"]
    assert (kd["start_resolution"], kd["weight"]) == (
        rkd["start_resolution"], rkd["weight"])
    assert bool(kd["use_image_level_kd"]) == bool(rkd["use_image_level_kd"])
