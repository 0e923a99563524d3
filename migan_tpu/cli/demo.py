"""Inpainting demo CLI — behavioral clone of the reference demo
(reference: scripts/demo.py) running the TPU-native generator.

    python -m migan_tpu.cli.demo --model-name migan-256 \
        --model-path migan_256.pt --images-dir imgs/ --masks-dir masks/ \
        --output-dir out/

Accepts the published PyTorch .pt state_dicts (imported on the fly) or this
framework's native .npz weights. The whole per-image model path (4-channel
input -> generator -> [-1,1] RGB) is one jitted XLA program; pre/post
processing matches the reference bit-for-bit (see data/preprocess.py).
"""

from __future__ import annotations

import argparse
import os
from glob import glob
from pathlib import Path

import numpy as np

from ..data.preprocess import read_mask, resize_max, preprocess, postprocess


def get_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-name", required=True,
                   help="One of [migan-256, migan-512, comodgan-256, comodgan-512]")
    p.add_argument("--model-path", required=True, help="Saved model path "
                   "(.pt torch state_dict or .npz native).")
    p.add_argument("--images-dir", type=Path, required=True)
    p.add_argument("--masks-dir", type=Path, required=True)
    p.add_argument("--invert-mask", action="store_true",
                   help="Invert mask? (make 0-known, 1-hole)")
    p.add_argument("--output-dir", type=Path, required=True)
    p.add_argument("--device", type=str, default="tpu",
                   help="Accepted for reference-CLI compatibility; JAX "
                   "selects the platform.")
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="float32")
    p.add_argument("--ch-base", type=int, default=None,
                   help="Channel bank base for comodgan-* (reference "
                   "comodgan.py Encoder/Synthesis ch_base; default 32768).")
    p.add_argument("--ch-max", type=int, default=None,
                   help="Channel cap for comodgan-* (default 512).")
    p.add_argument("--z-npy", type=str, default=None,
                   help="comodgan-*: .npy with a fixed z [512] (or [1,512]) "
                   "used for every image instead of per-call sampling — "
                   "makes runs reproducible / cross-framework comparable "
                   "(reference comodgan.py:438-445 accepts z the same way).")
    p.add_argument("--noise-mode", choices=["random", "const", "none"],
                   default="random",
                   help="comodgan-*: synthesis noise mode (reference "
                   "stylegan.py synthesis_layer); 'const' replays the "
                   "imported noise_const buffers deterministically.")
    p.add_argument("--batch-size", type=int, default=1,
                   help="Images per device dispatch. 1 (default) replays "
                   "the reference demo loop exactly; >1 runs the batched "
                   "serving path: host decode/encode on a thread pool "
                   "overlapped with device compute (outputs are identical "
                   "— the model is batch-independent).")
    p.add_argument("--io-workers", type=int, default=8,
                   help="Host threads for image decode/preprocess and "
                   "postprocess/encode when --batch-size > 1.")
    return p.parse_args(argv)


def load_model(model_name: str, model_path: str, dtype: str = "float32",
               ch_base=None, ch_max=None, z_npy=None, noise_mode="random"):
    """Returns (jitted_forward, resolution). forward: [N,H,W,4] -> [N,H,W,3]."""
    import jax
    import jax.numpy as jnp

    import re

    m = re.fullmatch(r"migan-(\d+)", model_name)
    if m and int(m.group(1)) >= 16 and (int(m.group(1))
                                        & (int(m.group(1)) - 1)) == 0:
        # any power-of-two resolution >=16: the inference G is fully
        # convolutional (migan-128 serves e.g. generators trained by the
        # demo_places128 experiment); the whole-stage Pallas ladders exist
        # for the reference's shipped 256/512 geometries. Malformed names
        # ('migan-base', 'migan-100') fall through to the unsupported-name
        # error below.
        from ..models.migan_inference import GeneratorConfig

        if (jax.default_backend() == "tpu" and jax.device_count() == 1
                and model_name in ("migan-256", "migan-512")):
            # whole-stage Pallas chain (migan-512 folded / migan-256
            # unfolded; falls back per-batch-geometry internally)
            from ..models.migan_pallas import generator_apply_pallas as \
                generator_apply
        else:
            # pallas_call needs a TPU, and under multi-device GSPMD the
            # Mosaic custom call has no partitioner (it would force a
            # full-batch gather); CPU / sharded runs keep the batch-folded
            # path, which XLA partitions cleanly.
            from ..models.migan_fold import generator_apply_fast as \
                generator_apply

        resolution = int(m.group(1))
        cfg = GeneratorConfig(resolution=resolution)
        if model_path.endswith(".npz"):
            from ..io.checkpoint import load_npz

            params = load_npz(model_path)
        else:
            from ..io import load_torch_state_dict, import_migan_inference

            params = import_migan_inference(load_torch_state_dict(model_path))

        @jax.jit
        def forward(x):
            y = generator_apply(params, x.astype(dtype), cfg)
            return y.astype(jnp.float32)

        return forward, resolution

    if model_name in ("comodgan-256", "comodgan-512"):
        from ..models.comodgan import load_comodgan_forward

        z = None
        if z_npy is not None:
            import numpy as np
            from ..models.comodgan import CoModGANConfig

            z = np.load(z_npy)
            z_dim = CoModGANConfig().z_dim
            if z.size != z_dim:
                raise SystemExit(
                    f"--z-npy must hold one latent of {z_dim} values "
                    f"([{z_dim}] or [1, {z_dim}]); got shape {z.shape}. "
                    "It is broadcast over the batch — per-image latents "
                    "are not supported.")
            z = z.reshape(1, z_dim).astype("float32")
        return load_comodgan_forward(model_name, model_path, dtype,
                                     ch_base=ch_base, ch_max=ch_max,
                                     z=z, noise_mode=noise_mode)

    raise ValueError(f"Unsupported model name: {model_name}")


def _list_images(images_dir) -> list:
    img_paths = []
    for ext in (".jpg", ".jpeg", ".png"):
        img_paths += glob(os.path.join(str(images_dir), "**", f"*{ext}"),
                          recursive=True)
    return sorted(img_paths)


def run_batched(forward, resolution: int, img_paths: list, masks_dir,
                output_dir, *, invert_mask: bool = False, batch_size: int = 8,
                io_workers: int = 8) -> int:
    """Batched serving loop: decode/preprocess on a thread pool, dispatch
    full [B,res,res,4] batches (one compiled program — the tail batch is
    zero-padded), postprocess/encode on the pool, and keep one batch in
    flight so host IO overlaps device compute (JAX dispatch is async; only
    np.asarray on a result blocks). Outputs match the per-image loop
    exactly: the generator is fully convolutional with no cross-batch ops.
    Returns the number of images written."""
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    def _load(img_path):
        stem = "".join(os.path.basename(img_path).split(".")[:-1])
        mask_path = os.path.join(str(masks_dir), stem + ".png")
        img = Image.open(img_path).convert("RGB")
        img_resized = resize_max(img, max_size=resolution)
        mask = read_mask(mask_path, invert=invert_mask)
        mask_resized = resize_max(mask, max_size=resolution,
                                  interpolation=Image.NEAREST)
        x = preprocess(img_resized, mask_resized, resolution)
        return img_path, img_resized, mask_resized, x

    def _save(result, img_path, img_resized, mask_resized):
        composed = postprocess(result, img_resized, mask_resized)
        composed.save(output_dir / f"{Path(img_path).stem}.png")

    from collections import deque

    n_written = 0
    # Bound host memory: at most ~2 batches of decoded inputs and saves in
    # flight, whatever the directory size (pool.map would submit ALL loads
    # eagerly — 10k images of decoded float32 input is tens of GB).
    max_inflight = max(2 * batch_size, 2 * io_workers)
    with ThreadPoolExecutor(max_workers=io_workers) as pool:

        def _loads():
            inflight = deque()
            for p in img_paths:
                inflight.append(pool.submit(_load, p))
                if len(inflight) >= max_inflight:
                    yield inflight.popleft().result()
            while inflight:
                yield inflight.popleft().result()

        def _batches():
            metas, xs = [], []
            for meta_x in _loads():
                metas.append(meta_x[:3])
                xs.append(meta_x[3])
                if len(xs) == batch_size:
                    yield metas, np.concatenate(xs, axis=0)
                    metas, xs = [], []
            if xs:  # zero-pad the tail to the compiled batch shape
                pad = batch_size - len(xs)
                xs += [np.zeros_like(xs[0])] * pad
                yield metas, np.concatenate(xs, axis=0)

        saves = deque()

        def _flush_saves(bound):
            nonlocal n_written
            while len(saves) > bound:
                saves.popleft().result()
                n_written += 1

        def _submit_saves(y, metas):
            res_np = np.asarray(y)  # blocks on the device result
            for i, (img_path, img_r, mask_r) in enumerate(metas):
                saves.append(pool.submit(_save, res_np[i], img_path,
                                         img_r, mask_r))
            _flush_saves(max_inflight)

        pending = None  # (device_result, metas) kept in flight
        for metas, x in _batches():
            y = forward(x)  # async dispatch; do not block here
            if pending is not None:
                _submit_saves(*pending)
            pending = (y, metas)
        if pending is not None:
            _submit_saves(*pending)
        _flush_saves(0)
    return n_written


def main(argv=None):
    args = get_args(argv)
    from ..utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    args.output_dir.mkdir(parents=True, exist_ok=True)

    forward, resolution = load_model(args.model_name, args.model_path,
                                     args.dtype, ch_base=args.ch_base,
                                     ch_max=args.ch_max, z_npy=args.z_npy,
                                     noise_mode=args.noise_mode)

    img_paths = _list_images(args.images_dir)

    if args.batch_size > 1:
        import time

        t0 = time.perf_counter()
        n = run_batched(forward, resolution, img_paths, args.masks_dir,
                        args.output_dir, invert_mask=args.invert_mask,
                        batch_size=args.batch_size,
                        io_workers=args.io_workers)
        dt = time.perf_counter() - t0
        print(f"inpainted {n} images in {dt:.2f}s "
              f"({n / dt:.1f} img/s end-to-end)")
        return

    from PIL import Image

    for img_path in img_paths:
        stem = "".join(os.path.basename(img_path).split(".")[:-1])
        mask_path = os.path.join(str(args.masks_dir), stem + ".png")

        img = Image.open(img_path).convert("RGB")
        img_resized = resize_max(img, max_size=resolution)
        mask = read_mask(mask_path, invert=args.invert_mask)
        mask_resized = resize_max(mask, max_size=resolution,
                                  interpolation=Image.NEAREST)

        x = preprocess(img_resized, mask_resized, resolution)
        result = np.asarray(forward(x))[0]
        composed = postprocess(result, img_resized, mask_resized)
        composed.save(args.output_dir / f"{Path(img_path).stem}.png")
        print(f"inpainted {img_path}")


if __name__ == "__main__":
    main()
