"""Per-stage timing of the migan-512 fast path, bf16, real TPU.

Times each piece of models/migan_fold.generator_apply_fast as a separate
jit (boundaries add relayout noise — read as a distribution, not gospel).

python scripts/bench_stages.py [batch]   (default 128)
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from migan_tpu.models.migan_inference import (
    GeneratorConfig, generator_init, resample_filter,
    sep_conv_apply, encoder_block_apply, _conv1x1_apply, ACT, _noise_for,
)
from migan_tpu.models.migan_fold import (
    fold, unfold, fold_stage_params, _sep_folded,
)
from migan_tpu.ops import conv2d, upsample2d


def timeit(f, *args, warmup=2, iters=10):
    g = jax.jit(f)

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
    cfg = GeneratorConfig(resolution=512)
    params = generator_init(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.ndim >= 1 else p, params)
    f = resample_filter()
    enc, syn = params["encoder"], params["synthesis"]
    p_et = fold_stage_params(enc["b512"])
    p_st = fold_stage_params(syn["b512"])
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16

    total = 0.0

    def report(name, ms):
        nonlocal total
        total += ms
        print(f"{name:28s} {ms:8.2f} ms", flush=True)

    # encoder top (folded)
    xf = jnp.asarray(rng.randn(bs // 2, 512, 512, 8), dt)

    def enc_top(xf):
        y = conv2d(xf, p_et["fromrgb"]["weight"])
        y = ACT(y + p_et["fromrgb"]["bias"].astype(y.dtype))
        feat_f = _sep_folded(p_et["conv1"], y, f)
        z = _sep_folded(p_et["conv2"], feat_f, f, down=2)
        return unfold(z), feat_f

    report("enc b512 (folded)", timeit(enc_top, xf))

    # remaining encoder stages, one jit per stage
    z = jnp.asarray(rng.randn(bs, 256, 256, 128), dt)
    for resi in cfg.encode_res[1:-1]:
        blk = enc[f"b{resi}"]
        ms = timeit(lambda z, blk=blk: encoder_block_apply(
            blk, z, None, f, down=2), z)
        report(f"enc b{resi}", ms)
        z = jnp.asarray(
            rng.randn(bs, resi // 2, resi // 2, cfg.ch(resi // 2)), dt)
    report("enc b4", timeit(
        lambda z: encoder_block_apply(enc["b4"], z, None, f, down=1), z))

    # synthesis b4
    z4 = jnp.asarray(rng.randn(bs, 4, 4, cfg.ch(4)), dt)
    f4 = jnp.asarray(rng.randn(bs, 4, 4, cfg.ch(4)), dt)

    def syn4(z, feat):
        zz = sep_conv_apply(syn["b4"]["conv1"], z, f)
        zz = zz + feat
        zz = sep_conv_apply(syn["b4"]["conv2"], zz, f)
        return zz, _conv1x1_apply(syn["b4"]["torgb"], zz)

    report("syn b4", timeit(syn4, z4, f4))

    # synthesis mid stages
    for res in cfg.block_res[1:-1]:
        p = syn[f"b{res}"]
        zz = jnp.asarray(
            rng.randn(bs, res // 2, res // 2, cfg.ch(res // 2)), dt)
        feat = jnp.asarray(rng.randn(bs, res, res, cfg.ch(res)), dt)
        img = jnp.asarray(rng.randn(bs, res // 2, res // 2, 3), dt)

        def syn_mid(zz, feat, img, p=p):
            zz = sep_conv_apply(p["conv1"], zz, f, up=2, use_noise=True)
            zz = zz + feat
            zz = sep_conv_apply(p["conv2"], zz, f, use_noise=True)
            img = upsample2d(img, f)
            return zz, img + _conv1x1_apply(p["torgb"], zz)

        report(f"syn b{res}", timeit(syn_mid, zz, feat, img))

    # synthesis top (folded)
    zz = jnp.asarray(rng.randn(bs, 256, 256, 128), dt)
    feat_f = jnp.asarray(rng.randn(bs // 2, 512, 512, 128), dt)
    img = jnp.asarray(rng.randn(bs, 256, 256, 3), dt)
    p_top = syn["b512"]

    def syn_top(zz, feat_f, img):
        c_in = zz.shape[-1]
        k = p_top["conv1"]["conv1"]["weight"].shape[0]
        t = conv2d(zz, p_top["conv1"]["conv1"]["weight"], padding=k // 2,
                   groups=c_in)
        t = ACT(t + p_top["conv1"]["conv1"]["bias"].astype(t.dtype))
        t = conv2d(t, p_top["conv1"]["conv2"]["weight"])
        t = fold(t)
        t = upsample2d(t, f, up=2)
        n = _noise_for(p_top["conv1"], t.shape[1], t.shape[2])
        t = ACT(t + n[None, :, :, None].astype(t.dtype))
        t = t + feat_f
        t = _sep_folded(p_st["conv2"], t, f, use_noise=True)
        img_f = fold(img)
        img_f = upsample2d(img_f, f)
        y = conv2d(t, p_st["torgb"]["weight"])
        y = y + p_st["torgb"]["bias"].astype(y.dtype)
        return unfold(img_f + y)

    report("syn b512 (folded)", timeit(syn_top, zz, feat_f, img))

    print(f"{'TOTAL (sum of pieces)':28s} {total:8.2f} ms  "
          f"-> {bs / total * 1000:.0f} img/s", flush=True)


if __name__ == "__main__":
    main()
