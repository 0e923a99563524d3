"""Export CLI: fold a trained (re-parameterized) generator into the lean
inference net, validate numerically, and serialize.

Behavioral analog of reference scripts/export_inference_model.py, with
StableHLO replacing ONNX/TorchScript:

    python -m migan_tpu.cli.export --model-path ckpt.npz --resolution 256 \
        --origs-dir imgs/ --masks-dir masks/ --output-dir out/

Inputs: a native .npz of training-G params (e.g. the params_G_ema tree from
an orbax checkpoint), a torch .pt state_dict, or a reference
network-snapshot-*.pkl (whole-module pickle; loaded without reference code
via io.pkl_import and folded from its G_ema). Outputs:
  out/models/migan.npz          folded inference weights (native)
  out/models/migan.stablehlo    serialized jitted forward
  out/samples/...               original vs converted sample results
  printed "Average diff %"      fold-parity statistic (reference :163-164)
"""

from __future__ import annotations

import argparse
import os
from glob import glob
from pathlib import Path

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-path", type=str, required=True,
                   help=".npz training-G params or torch .pt state_dict")
    p.add_argument("--origs-dir", type=Path, required=True)
    p.add_argument("--masks-dir", type=Path, required=True)
    p.add_argument("--output-dir", type=Path, required=True)
    p.add_argument("--resolution", type=int, required=True)
    p.add_argument("--num-samples", type=int, default=10)
    p.add_argument("--num-reparam-tensors", type=int, default=9)
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    from ..utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    from PIL import Image

    from ..models.migan import MiganConfig, generator_apply as train_apply
    from ..models.migan_inference import (GeneratorConfig,
                                          generator_apply as inf_apply)
    from ..export.fold import fold_generator
    from ..export import stablehlo
    from ..io.checkpoint import save_npz, load_npz

    (args.output_dir / "models").mkdir(parents=True, exist_ok=True)
    orig_dir = args.output_dir / "samples" / "original_result"
    conv_dir = args.output_dir / "samples" / "converted_result"
    orig_dir.mkdir(parents=True, exist_ok=True)
    conv_dir.mkdir(parents=True, exist_ok=True)

    cfg = MiganConfig(resolution=args.resolution, depthwise=True,
                      reparametrize=True,
                      num_reparam_tensors=args.num_reparam_tensors)
    if os.path.isdir(args.model_path):
        # an orbax TrainState checkpoint dir (log/<run>/weight/step_N or
        # the weight/ dir itself): fold the EMA weights, as the reference
        # export folds a snapshot's G_ema
        from ..train.checkpoint import extract_field, latest

        path = latest(args.model_path) or args.model_path
        print(f"extracting params_G_ema from {path}")
        train_params = extract_field(path, "params_G_ema")
    elif args.model_path.endswith(".npz"):
        train_params = load_npz(args.model_path)
    elif args.model_path.endswith(".pkl"):
        # Reference training snapshot {'G','D','G_ema'} of whole torch
        # modules (reference: lib/experiments/migan_default.py:538-551;
        # consumed by scripts/export_inference_model.py:116-124). Export
        # folds G_ema, as the reference does.
        from ..io import import_migan_train, load_reference_snapshot

        snap = load_reference_snapshot(args.model_path)
        sd = snap.get("G_ema") or snap.get("G")
        if sd is None:
            raise SystemExit(
                f"{args.model_path}: no G_ema/G module found in snapshot")
        train_params = import_migan_train(sd)
    else:
        from ..io import load_torch_state_dict, import_migan_train

        train_params = import_migan_train(
            load_torch_state_dict(args.model_path))

    print("Folding weights...")
    folded = fold_generator(train_params, cfg)
    icfg = GeneratorConfig(resolution=args.resolution)

    img_paths = []
    if args.num_samples > 0:  # 0 skips the (slow) dual-forward diff stat
        for ext in (".jpg", ".jpeg", ".png"):
            img_paths += glob(os.path.join(str(args.origs_dir), "**",
                                           f"*{ext}"), recursive=True)
        img_paths = sorted(img_paths)[: args.num_samples]

    print("Calculating diff statistic...")
    diff_sum = 0
    for img_path in img_paths:
        mask_path = os.path.join(str(args.masks_dir),
                                 f"{Path(img_path).stem}.png")
        img = Image.open(img_path).convert("RGB").resize(
            (args.resolution, args.resolution), Image.BICUBIC)
        mask = Image.open(mask_path).convert("L").resize(
            (args.resolution, args.resolution), Image.NEAREST)
        img_np = np.asarray(img, np.float32) / 255.0
        img_np = (img_np - 0.5) * 2
        mask_np = (np.asarray(mask, np.float32) / 255.0)[:, :, None]
        x = jnp.asarray(np.concatenate([mask_np - 0.5, img_np * mask_np],
                                       axis=-1)[None])

        original = np.asarray(train_apply(train_params, x, cfg,
                                          noise_mode="const"))
        converted = np.asarray(inf_apply(folded, x, icfg))
        diff_sum += (~np.isclose(original, converted, rtol=1e-3)).sum()

        for arr, outdir in ((original, orig_dir), (converted, conv_dir)):
            comp = img_np * mask_np + (arr[0] * 0.5 + 0.5) * (1 - mask_np)
            comp = np.clip(comp * 255, 0, 255).astype(np.uint8)
            Image.fromarray(comp).save(outdir / f"{Path(img_path).stem}.png")

    n = max(len(img_paths), 1)
    print(f"Average diff %: "
          f"{diff_sum / n / (args.resolution ** 2) * 100:.2f}%")

    print("Saving folded weights (npz)...")
    save_npz(str(args.output_dir / "models" / "migan.npz"), folded)

    print("Exporting StableHLO...")
    dummy = jnp.zeros((1, args.resolution, args.resolution, 4), jnp.float32)
    stablehlo.save(str(args.output_dir / "models" / "migan.stablehlo"),
                   lambda x: inf_apply(folded, x, icfg), [dummy])
    print("StableHLO model exported")


if __name__ == "__main__":
    main()
