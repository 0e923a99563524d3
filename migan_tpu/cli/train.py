"""Training entry point — the analog of the reference main.py + run.sh.

    python -m migan_tpu.cli.train --experiment migan_places256 [--debug] \
        [--seed 0] [--signature tag ...] [--resume-path log/...]

Differences from the reference launcher (reference: main.py:13-35, run.sh):
no mp.spawn / per-GPU processes / NCCL ports — a single process drives all
local devices through the jitted data-parallel step; multi-host runs call
jax.distributed.initialize() first (env-driven).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import shutil

from ..utils.config import (ConfigBanks, apply_overrides, cfg_to_debug,
                            get_experiment_id, split_batch,
                            cfg_unique_holder)
from ..utils.logging import print_log, set_log_file


def get_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--experiment", type=str, required=True)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--config-root", type=str, default="configs")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--signature", nargs="+", type=str, default=None)
    p.add_argument("--resume-path", type=str, default=None)
    p.add_argument("--max-steps", type=int, default=None,
                   help="stop after N optimizer steps (smoke runs)")
    p.add_argument("--model-g", type=str, default=None,
                   help="swap model_g from the model bank "
                        "(reference --model capability)")
    p.add_argument("--model-d", type=str, default=None,
                   help="swap model_d from the model bank")
    p.add_argument("--dataset", type=str, default=None,
                   help="swap train.dataset (and eval.dataset if present) "
                        "from the dataset bank")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="PATH=VALUE",
                   help="override any config path, YAML-parsed value "
                        "(e.g. --set train.g_opt_kwargs.lr=1e-4); "
                        "repeatable")
    return p.parse_args(argv)


def cfg_initiates(cfg, args):
    """Log-dir naming + code snapshot + seeds
    (reference lib/cfg_helper.py:383-585, condensed)."""
    import jax

    cfgt = cfg["train"]
    if args.seed is not None:
        cfg.setdefault("env", {})["rnd_seed"] = args.seed
    if args.signature:
        cfgt["signature"] = list(args.signature)
    if args.resume_path:
        cfgt["resume_path"] = args.resume_path

    if args.debug:
        cfg_to_debug(cfg)
    if cfgt.get("experiment_id") is None:
        cfgt["experiment_id"] = get_experiment_id()

    split_batch(cfgt, jax.local_device_count())

    sig = "-".join(str(s) for s in (cfgt.get("signature") or []))
    model_name = cfg.get("model_g", {}).get("name", "model")
    run_name = f"{cfgt['experiment_id']}-{model_name}"
    if sig:
        run_name += f"-{sig}"
    log_root = cfg.get("env", {}).get("log_root_dir", "log")
    log_dir = osp.join(log_root, run_name)
    cfgt["log_dir"] = log_dir
    os.makedirs(log_dir, exist_ok=True)
    set_log_file(osp.join(log_dir, "train.log"))

    # code snapshot (reference cfg_helper.py:551-563)
    if cfgt.get("save_code"):
        code_dir = osp.join(log_dir, "code")
        if not osp.isdir(code_dir):
            src = osp.dirname(osp.dirname(osp.abspath(__file__)))
            shutil.copytree(src, osp.join(code_dir, "migan_tpu"),
                            ignore=shutil.ignore_patterns("__pycache__"))

    # persist the resolved config for exact resume
    import yaml

    with open(osp.join(log_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
    return cfg


def main(argv=None):
    args = get_args(argv)

    # SIGUSR1 -> dump all thread stacks to stderr without dying. Long
    # multi-hour runs over a remote-device transport can stall on a hung
    # RPC; this gives operators a zero-setup way to see where (the
    # reference relied on py-spy/gdb against its per-GPU workers).
    import faulthandler
    import signal
    faulthandler.register(signal.SIGUSR1, all_threads=True)

    from ..utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    # multi-host: one process per host, env-gated (MIGAN_TPU_MULTIHOST=1 +
    # standard JAX coordination env). Must run before any jax use so every
    # process sees the global device set. Replaces the reference's run.sh
    # TCP rendezvous + mp.spawn (reference run.sh:28-96, main.py:13-35).
    from ..parallel.mesh import maybe_initialize_distributed
    maybe_initialize_distributed()

    banks = ConfigBanks(args.config_root)
    cfg = banks.experiment(args.experiment)
    # subtree swaps from the banks (reference --model/--dataset,
    # cfg_helper.py:308-319), then dotted-path --set overrides last.
    if args.model_g:
        cfg["model_g"] = banks.model(args.model_g)
    if args.model_d:
        cfg["model_d"] = banks.model(args.model_d)
    if args.dataset:
        ds = banks.dataset(args.dataset)
        if "train" in cfg:
            cfg["train"]["dataset"] = ds
        if "eval" in cfg:
            cfg["eval"]["dataset"] = ds
    apply_overrides(cfg, args.overrides)
    cfg = cfg_initiates(cfg, args)
    cfg_unique_holder().save_cfg(cfg)

    import jax

    print_log(f"devices: {jax.devices()}")
    print_log(f"experiment: {args.experiment} -> {cfg['train']['log_dir']}")

    from ..train.loop import train_stage

    train_stage(cfg, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
