"""Build + export the end-to-end inpainting app pipeline and self-check it.

Behavioral analog of reference scripts/create_onnx_pipeline.py with StableHLO
replacing ONNX:

    python -m migan_tpu.cli.create_pipeline --resolution 256 \
        --model-path migan_256.npz --images-dir imgs/ --masks-dir masks/ \
        --output-dir out/

The pipeline (mask-bbox crop -> resize -> G -> feathered composite) is one
jitted XLA program (export/pipeline.py). I/O: uint8 RGB image + uint8 mask,
255 = known (reference README.md:223-227). Because XLA requires static
shapes, the pipeline is exported at size buckets (--buckets, default
512,1024,2048) and the self-check pads each example to the nearest bucket.
"""

from __future__ import annotations

import argparse
import os
from glob import glob
from pathlib import Path

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--resolution", type=int, required=True)
    p.add_argument("--model-path", type=str, required=True)
    p.add_argument("--images-dir", type=Path, required=True)
    p.add_argument("--masks-dir", type=Path, required=True)
    p.add_argument("--invert-mask", action="store_true")
    p.add_argument("--output-dir", type=Path, required=True)
    p.add_argument("--device", type=str, default="tpu")
    p.add_argument("--buckets", type=str, default="512,1024")
    p.add_argument("--polymorphic", action="store_true",
                   help="also export ONE shape-polymorphic program "
                        "(symbolic H/W, like the reference ONNX dynamic "
                        "axes) alongside the static buckets")
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    from ..utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    from PIL import Image

    from .demo import load_model
    from ..data.preprocess import read_mask
    from ..export.pipeline import make_pipeline
    from ..export import stablehlo

    (args.output_dir / "models").mkdir(parents=True, exist_ok=True)
    (args.output_dir / "sample_results").mkdir(parents=True, exist_ok=True)

    forward, resolution = load_model(f"migan-{args.resolution}",
                                     args.model_path)
    pipeline = make_pipeline(forward, resolution=resolution)

    buckets = sorted(int(b) for b in args.buckets.split(","))
    print("Exporting StableHLO pipeline buckets...")
    for b in buckets:
        img = jnp.zeros((1, b, b, 3), jnp.uint8)
        mask = jnp.full((1, b, b, 1), 255, jnp.uint8)
        path = args.output_dir / "models" / f"migan_pipeline_{b}.stablehlo"
        stablehlo.save(str(path), pipeline, [img, mask])
        print(f"  exported {path}")
    if args.polymorphic:
        # one program, symbolic H/W (reference ONNX dynamic axes analog,
        # create_onnx_pipeline.py:293-318). The lower bound is only what
        # the reflect-pad blur's lowering needs (pad=2 -> dim > 4), so
        # images with a side at or even below the model resolution stay
        # servable, like the reference's dynamic axes.
        b0 = buckets[0]
        img = jnp.zeros((1, b0, b0, 3), jnp.uint8)
        mask = jnp.full((1, b0, b0, 1), 255, jnp.uint8)
        lo = 8
        path = (args.output_dir / "models"
                / "migan_pipeline_dynamic.stablehlo")
        stablehlo.save(str(path), pipeline, [img, mask],
                       polymorphic_shapes=["1, h, w, 3", "1, h, w, 1"],
                       constraints=[f"h >= {lo}", f"w >= {lo}"])
        print(f"  exported {path} (symbolic H/W >= {lo})")

    img_paths = []
    for ext in (".jpg", ".jpeg", ".png"):
        img_paths += glob(os.path.join(str(args.images_dir), "**", f"*{ext}"),
                          recursive=True)
    for img_path in sorted(img_paths):
        stem = Path(img_path).stem
        mask_path = os.path.join(str(args.masks_dir), stem + ".png")
        img = Image.open(img_path).convert("RGB")
        mask = read_mask(mask_path, invert=args.invert_mask)
        img_np = np.asarray(img, np.uint8)
        mask_np = np.asarray(mask, np.uint8)
        h, w = img_np.shape[:2]
        # pad to the smallest bucket that fits (mask pad = known)
        b = next((b for b in buckets if b >= max(h, w)), buckets[-1])
        pi = np.zeros((1, b, b, 3), np.uint8)
        pm = np.full((1, b, b, 1), 255, np.uint8)
        pi[0, :h, :w] = img_np
        pm[0, :h, :w, 0] = mask_np
        out = np.asarray(pipeline(jnp.asarray(pi), jnp.asarray(pm)))
        Image.fromarray(out[0, :h, :w]).save(
            args.output_dir / "sample_results" / f"{stem}.png")
        print(f"inpainted {img_path}")


if __name__ == "__main__":
    main()
