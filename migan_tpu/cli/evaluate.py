"""Batched FID + LPIPS evaluation CLI — behavioral clone of the reference
(reference: scripts/evaluate_fid_lpips.py), running model + detectors as
jitted XLA programs.

    python -m migan_tpu.cli.evaluate --model-name migan-256 \
        --model-path migan_256.pt --real-dir places_val/ \
        [--mask-dir masks/] [--batch-size 64] \
        [--inception-weights pt_inception.pth] [--lpips-weights alex.pth]

Protocol parity with the reference:
  - np.random.seed(0) / random.seed(0) before mask synthesis
    (evaluate_fid_lpips.py:180-181)
  - images resized BICUBIC to model res; pre-generated masks (255=known) or
    on-the-fly RandomMask
  - composite = mask*img + (1-mask)*output; both metrics on [0,1] images
  - FID from full activation arrays via np.mean/np.cov + scipy sqrtm

Detector weights are .pth/.pt state_dicts (pytorch_fid InceptionV3 /
lpips alex). Without them, --allow-random-detector runs the pipeline with
random detector weights (plumbing smoke test; metric values meaningless).
"""

from __future__ import annotations

import argparse
import os.path as osp
import random
from pathlib import Path

import numpy as np

from ..data.masks import random_mask_uint8


def get_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-name", type=str, required=True)
    p.add_argument("--model-path", type=str, required=True)
    p.add_argument("--real-dir", type=Path, required=True)
    p.add_argument("--mask-dir", type=Path, default=None)
    p.add_argument("--device", type=str, default="tpu")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--num-workers", type=int, default=1,
                   help="loader threads. Default 1 keeps on-the-fly masks "
                   "on the sequential seed-0 global stream (bit-exact "
                   "reference protocol); >1 — or any multi-process run — "
                   "switches to the per-item seeded stream: still "
                   "deterministic, but a different stream than the "
                   "reference, so published-number comparisons should "
                   "keep 1 in one process (or pass --mask-dir, identical "
                   "under all modes)")
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="float32")
    p.add_argument("--inception-weights", type=str, default=None)
    p.add_argument("--lpips-weights", type=str, default=None)
    p.add_argument("--allow-random-detector", action="store_true")
    p.add_argument("--detector-dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="bfloat16 runs the detector conv stacks in bf16 "
                   "(faster scoring — ~5%% end-to-end at 512/bs128 where "
                   "the generator dominates, more when scoring cached "
                   "images; shifts FID slightly — keep float32 when "
                   "comparing against published numbers).")
    p.add_argument("--max-items", type=int, default=None)
    p.add_argument("--real-acts-cache", type=str, default=None,
                   help="npz path caching the REAL images' Inception "
                   "activations across runs (they do not depend on the "
                   "model; the training-metrics stack caches the same "
                   "way). First run computes + saves; later runs skip "
                   "the real-side detector pass — identical FID inputs, "
                   "~10%% faster steady-state scoring. Invalidate by "
                   "deleting the file when the real set or detector "
                   "weights change.")
    p.add_argument("--data-parallel", action="store_true", default=None,
                   help="shard eval batches over all devices (default: on "
                   "when more than one device is visible)")
    return p.parse_args(argv)


class InferenceDataset:
    """reference evaluate_fid_lpips.py:124-165 (NHWC).

    On-the-fly masks draw from `rng` when the DataLoader passes a
    per-item one (num_workers > 1: deterministic at any worker count),
    and from the seed-0 global np.random stream otherwise (num_workers=1:
    bit-exact reference protocol, evaluate_fid_lpips.py:180-181)."""

    IMG_EXT = {".jpg", ".jpeg", ".JPG", ".JPEG", ".png", ".PNG"}
    supports_rng = True

    def __init__(self, real_dir: Path, mask_dir=None, resolution=None):
        self.img_paths = [p for p in Path(real_dir).iterdir()
                          if p.suffix in self.IMG_EXT]
        self.mask_dir = mask_dir
        self.resolution = resolution

    def __len__(self):
        return len(self.img_paths)

    def __getitem__(self, index, rng=None):
        from PIL import Image

        img_path = self.img_paths[index]
        img = Image.open(img_path).convert("RGB")
        if img.size != (self.resolution, self.resolution):
            img = img.resize((self.resolution, self.resolution),
                             Image.BICUBIC)
        if self.mask_dir is not None:
            mask = Image.open(self.mask_dir / f"{img_path.stem}.png")
            mask = mask.convert("L").resize(
                (self.resolution, self.resolution), Image.NEAREST)
        else:
            mask = Image.fromarray(random_mask_uint8(
                self.resolution, rng=np.random if rng is None else rng
            )).convert("L")
        img_np = np.asarray(img, np.float32) * 2 / 255 - 1
        mask_np = (np.asarray(mask)[:, :, None] // 255).astype(np.float32)
        x = np.concatenate([mask_np - 0.5, img_np * mask_np], axis=-1)
        return x, img_np, mask_np, img_path.stem


def load_detectors(args):
    import jax
    from ..evalx.inception import (inception_apply, inception_init,
                                   import_inception_state_dict)
    from ..evalx.lpips import lpips_apply, lpips_init, import_lpips_state_dict

    if args.inception_weights:
        from ..io.torch_import import load_torch_state_dict

        inc_params = import_inception_state_dict(
            load_torch_state_dict(args.inception_weights))
    elif args.allow_random_detector:
        print("WARNING: random Inception weights — FID is meaningless")
        inc_params = inception_init(jax.random.PRNGKey(0))
    else:
        raise SystemExit("--inception-weights required "
                         "(or --allow-random-detector for smoke tests)")

    if args.lpips_weights:
        from ..io.torch_import import load_torch_state_dict

        lp_params = import_lpips_state_dict(
            load_torch_state_dict(args.lpips_weights))
    elif args.allow_random_detector:
        print("WARNING: random LPIPS weights — LPIPS is meaningless")
        lp_params = lpips_init(jax.random.PRNGKey(1))
    else:
        raise SystemExit("--lpips-weights required "
                         "(or --allow-random-detector for smoke tests)")

    cd = None if args.detector_dtype == "float32" else args.detector_dtype
    inception = jax.jit(
        lambda x: inception_apply(inc_params, x, compute_dtype=cd))
    lp = jax.jit(
        lambda a, b: lpips_apply(lp_params, a, b, normalize=True,
                                 compute_dtype=cd))
    return inception, lp


def main(argv=None):
    args = get_args(argv)
    from ..utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    np.random.seed(0)
    random.seed(0)

    import jax.numpy as jnp

    from .demo import load_model
    from ..data.sampler import DataLoader
    from ..evalx.fid import fid_from_feature_arrays

    forward, resolution = load_model(args.model_name, args.model_path,
                                     args.dtype)
    inception, lp = load_detectors(args)

    import jax

    ds = InferenceDataset(args.real_dir, args.mask_dir, resolution)
    n = len(ds) if args.max_items is None else min(len(ds), args.max_items)
    # multi-host: each process evaluates a rank-strided, extend-padded
    # shard of the items on its LOCAL devices; per-item results are
    # re-interleaved after a host allgather (the reference's DDP zipzap
    # gather, lib/evaluator/evaluator_base pattern, without NCCL).
    n_proc = jax.process_count()
    if n_proc > 1:
        from ..data.sampler import ShardSampler

        indices = ShardSampler(n, num_shards=n_proc,
                               shard=jax.process_index(), shuffle=False,
                               extend=True).epoch_indices(0)
    else:
        indices = range(n)
    # num_workers=1 in a single process (the default) keeps on-the-fly
    # masks on the sequential seed-0 global stream (bit-exact reference
    # protocol); more workers — or ANY multi-process run — switch to
    # per-item seeded RNG: still fully deterministic, but a different
    # (worker- and process-count-independent) stream. A sharded run must
    # never use the global stream: every process would draw the same
    # seed-0 sequence for different images (cross-shard mask collisions)
    # while start_position/position_stride went ignored. Pre-generated
    # --mask-dir is identical under all of these. Multi-process positions
    # are rank-strided so shards draw from interleaved global positions;
    # the union equals the single-process per-item stream.
    dl = DataLoader(ds, batch_size=args.batch_size,
                    indices=indices, num_workers=args.num_workers,
                    drop_last=False,
                    seed=0 if (args.num_workers > 1 or n_proc > 1) else None,
                    start_position=jax.process_index(),
                    position_stride=n_proc)

    # Data-parallel sharding: batches split over the per-process device
    # mesh; the jitted model/detector partition automatically (replaces the
    # reference's multi-GPU DDP eval; scales to a v5e-8 slice unchanged).
    use_dp = (args.data_parallel if args.data_parallel is not None
              else jax.local_device_count() > 1)
    shard = None
    if use_dp:
        from ..parallel.mesh import make_mesh, batch_sharding

        mesh = make_mesh(devices=jax.local_devices())
        sharding = batch_sharding(mesh)
        n_dev = jax.local_device_count()

        def shard(a):
            """Pad the batch to a device multiple and shard it; returns
            (sharded array, pad rows to drop from per-item results)."""
            pad = (-a.shape[0]) % n_dev
            if pad:
                a = np.concatenate([a, np.repeat(a[-1:], pad, axis=0)])
            return jax.device_put(a, sharding), pad

    cache_path = args.real_acts_cache
    cached_real = None
    if cache_path and osp.isfile(cache_path):
        z = np.load(cache_path)
        if z["acts"].shape[0] == n:
            cached_real = z["acts"]
            print(f"real activations from cache: {cache_path}")
        else:
            print(f"ignoring {cache_path}: has {z['acts'].shape[0]} "
                  f"items, need {n}")

    print("Starting the inference... ")
    lpips_vals = []
    real_acts, fake_acts = [], []
    for x, imgs, masks, names in dl:
        npad = 0
        if shard is not None:
            (x, npad), (imgs, _), (masks, _) = (shard(x), shard(imgs),
                                                shard(masks))
        x = jnp.asarray(x)
        out = forward(x)
        imgs_j = jnp.asarray(imgs)
        masks_j = jnp.asarray(masks)
        composed = masks_j * imgs_j + (1 - masks_j) * out
        imgs01 = jnp.clip(imgs_j * 0.5 + 0.5, 0, 1)
        comp01 = jnp.clip(composed * 0.5 + 0.5, 0, 1)
        lp_b = np.asarray(lp(imgs01, comp01))
        ra = (None if cached_real is not None
              else np.asarray(inception(imgs01)))
        fa = np.asarray(inception(comp01))
        if npad:  # drop the device-padding rows
            lp_b, fa = lp_b[:-npad], fa[:-npad]
            ra = None if ra is None else ra[:-npad]
        lpips_vals.extend(lp_b.tolist())
        if ra is not None:
            real_acts.append(ra)
        fake_acts.append(fa)

    lpips_arr = np.asarray(lpips_vals, np.float64)
    real_acts = (cached_real if cached_real is not None
                 else np.concatenate(real_acts))
    fake_acts = np.concatenate(fake_acts)
    if n_proc > 1:
        # allgather per-shard results, re-interleave to the original item
        # order (shard s holds items s, s+P, s+2P, ...), trim extend-pad
        from jax.experimental import multihost_utils

        def zipzap(a):
            g = multihost_utils.process_allgather(a)   # [P, m, ...]
            g = np.swapaxes(np.asarray(g), 0, 1)       # [m, P, ...]
            return g.reshape((-1,) + g.shape[2:])[:n]

        lpips_arr, fake_acts = zipzap(lpips_arr), zipzap(fake_acts)
        if cached_real is None:
            real_acts = zipzap(real_acts)
        lpips_vals = lpips_arr.tolist()
    if cache_path and cached_real is None and jax.process_index() == 0:
        np.savez(cache_path, acts=real_acts)
        print(f"cached real activations -> {cache_path}")

    print("Calculating Frechet distance. Please wait... ")
    fid_value = fid_from_feature_arrays(real_acts, fake_acts)
    print("FID:", fid_value)
    print("LPIPS: ", float(np.mean(lpips_vals)))
    return fid_value, float(np.mean(lpips_vals))


if __name__ == "__main__":
    main()
