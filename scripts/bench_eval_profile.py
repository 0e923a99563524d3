"""Decompose the fused eval-pipeline program (VERDICT r4 Next #7: the
eval stack is MXU-dense and should not cost 28% of bare-generator
throughput — find where the 516 vs 713 img/s gap lives).

Times, at migan-512 bs=128 (bench.py's eval workload):
  - the full fused eval step (baseline; bench_eval_step clone)
  - each component alone: G, composite+clip, detector resize,
    InceptionV3 (f32/bf16, batch N and 2N), LPIPS (f32/bf16)
  - full-step variants: one batched Inception call over [real; fake],
    bf16 detectors, and both combined

python scripts/bench_eval_profile.py [bs]   # default 128, real TPU
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from migan_tpu.models.migan_inference import GeneratorConfig, generator_init
from migan_tpu.models.migan_pallas import generator_apply_pallas
from migan_tpu.evalx.inception import inception_apply, inception_init
from migan_tpu.evalx.lpips import lpips_apply, lpips_init


def timeit(fn, *args, warmup=2, iters=8):
    g = jax.jit(fn)

    @jax.jit
    def checksum(y):
        leaves = jax.tree_util.tree_leaves(y)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    for _ in range(warmup):
        float(np.asarray(checksum(g(*args))))
    t0 = time.perf_counter()
    y = None
    for _ in range(iters):
        y = g(*args)
    float(np.asarray(checksum(y)))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    res = 512
    cfg = GeneratorConfig(resolution=res)
    gp = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.ndim >= 1 else p,
        generator_init(jax.random.PRNGKey(0), cfg))
    ip = inception_init(jax.random.PRNGKey(1))
    lpp = lpips_init(jax.random.PRNGKey(2))

    x = jnp.zeros((bs, res, res, 4), jnp.bfloat16)
    imgs = jnp.zeros((bs, res, res, 3), jnp.float32)
    masks = jnp.ones((bs, res, res, 1), jnp.float32)
    img01 = jnp.zeros((bs, res, res, 3), jnp.float32)
    img01_2n = jnp.zeros((2 * bs, res, res, 3), jnp.float32)

    out = {"bs": bs}

    def full(batched_det, det_dtype):
        def step(x, imgs, masks):
            o = generator_apply_pallas(gp, x, cfg).astype(jnp.float32)
            composed = masks * imgs + (1 - masks) * o
            i01 = jnp.clip(imgs * 0.5 + 0.5, 0, 1)
            c01 = jnp.clip(composed * 0.5 + 0.5, 0, 1)
            lp = lpips_apply(lpp, i01, c01, normalize=True,
                             compute_dtype=det_dtype)
            if batched_det:
                acts = inception_apply(ip, jnp.concatenate([i01, c01]),
                                       compute_dtype=det_dtype)
                ra, fa = acts[:bs], acts[bs:]
            else:
                ra = inception_apply(ip, i01, compute_dtype=det_dtype)
                fa = inception_apply(ip, c01, compute_dtype=det_dtype)
            return (jnp.sum(lp) + jnp.sum(ra.astype(jnp.float32))
                    + jnp.sum(fa.astype(jnp.float32)))
        return step

    for name, b, dt in [("full_baseline", False, None),
                        ("full_batched_det", True, None),
                        ("full_bf16_det", False, "bfloat16"),
                        ("full_batched_bf16", True, "bfloat16")]:
        ms = timeit(full(b, dt), x, imgs, masks)
        out[name + "_ms"] = round(ms, 1)
        out[name + "_imgs_per_sec"] = round(bs / ms * 1000, 1)
        print(name, out[name + "_ms"], "ms", out[name + "_imgs_per_sec"],
              "img/s", flush=True)

    out["G_ms"] = round(timeit(
        lambda x: jnp.sum(generator_apply_pallas(gp, x, cfg)
                          .astype(jnp.float32)), x), 1)
    out["composite_ms"] = round(timeit(
        lambda o, imgs, masks: jnp.clip(
            (masks * imgs + (1 - masks) * o) * 0.5 + 0.5, 0, 1),
        imgs, imgs, masks), 1)
    out["resize_ms"] = round(timeit(
        lambda v: jax.image.resize(v, (bs, 299, 299, 3), "bilinear"),
        img01), 1)
    out["resize_bf16_ms"] = round(timeit(
        lambda v: jax.image.resize(v.astype(jnp.bfloat16),
                                   (bs, 299, 299, 3), "bilinear"),
        img01), 1)
    for dt, tag in ((None, "f32"), ("bfloat16", "bf16")):
        out[f"inception_{tag}_ms"] = round(timeit(
            lambda v: inception_apply(ip, v, compute_dtype=dt), img01), 1)
        out[f"inception2n_{tag}_ms"] = round(timeit(
            lambda v: inception_apply(ip, v, compute_dtype=dt),
            img01_2n), 1)
        out[f"lpips_{tag}_ms"] = round(timeit(
            lambda a, b: lpips_apply(lpp, a, b, normalize=True,
                                     compute_dtype=dt), img01, img01), 1)
    print(json.dumps(out, indent=1), flush=True)
    with open("/tmp/eval_profile.json", "wt") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
