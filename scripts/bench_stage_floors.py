"""Per-stage VPU-floor table for the Pallas inference chain (VERDICT r4
Next #1b: "at the floor" must be measured per stage, not extrapolated
from one shape).

Walks the exact kernel sequence of models/migan_pallas.generator_apply_pallas
for migan-512 (folded) AND migan-256 (unfolded) with real-shaped weights,
timing every fused_* call on the TPU and comparing it to the HBM
round-trip floor of its true operand+result bytes (floor_ms =
bytes / measured copy bandwidth at that size class). ratio <= ~1.15
means the stage is bytes-bound (nothing left to harvest by cutting VPU
work); >> 1 marks VPU-issue-bound stages.

python scripts/bench_stage_floors.py [bs512] [bs256]   # defaults 32 64
(bs512=32 i.e. Nf=16 after folding: per-row kernel cost is
batch-invariant at these sizes — bench.py's vpu_floor methodology.)

Writes /tmp/stage_floors.json; bench.py embeds the same table via
run_stage_floors().
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, warmup=2, iters=10):
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
    return (time.perf_counter() - t0) / iters * 1000, y


_BW_CACHE = {}


def copy_gbps(nbytes, dt=jnp.bfloat16):
    """Measured HBM copy bandwidth (read+write) for a tensor of ~nbytes,
    bucketed by power of 4 so each size class is measured once."""
    import math

    bucket = max(1 << 22, 1 << (int(math.log2(max(nbytes, 1))) & ~1))
    if bucket not in _BW_CACHE:
        n = bucket // np.dtype(dt).itemsize
        x = jnp.zeros((n // 128, 128), dt)
        ms, _ = timeit(lambda x: x * dt(1.0009765625), x)
        _BW_CACHE[bucket] = 2 * bucket / 1e9 / (ms / 1e3)
    return _BW_CACHE[bucket]


def tree_bytes(t):
    return sum(l.size * l.dtype.itemsize for l in jax.tree_util.tree_leaves(t)
               if hasattr(l, "size"))


def walk_chain(resolution, bs, dt=jnp.bfloat16):
    """Replicates generator_apply_pallas's kernel sequence, timing each
    fused_* call (the XLA glue between kernels is excluded on purpose —
    the table is about the kernels vs their byte floors)."""
    from migan_tpu.models.migan_inference import (
        GeneratorConfig, generator_init, ACT, _noise_for)
    from migan_tpu.models.migan_pallas import (_fold_factor, _flat_pw)
    from migan_tpu.models.migan_fold import fold, fold_stage_params
    from migan_tpu.ops import conv2d
    from migan_tpu.ops.pallas.packedblock import fused_block_packed
    from migan_tpu.ops.pallas.sepconv import fused_block
    from migan_tpu.ops.pallas.upblock import fused_up_block
    from migan_tpu.ops.pallas.downblock import fused_down_block

    cfg = GeneratorConfig(resolution=resolution)
    params = generator_init(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(dt) if p.ndim >= 1 else p, params)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(bs, resolution, resolution, 4) * 0.5, dt)

    ff = _fold_factor(cfg, bs)
    assert ff > 0, (resolution, bs)
    rows = []

    # Fixed per-dispatch cost (host dispatch + tunnel sync): measured on
    # a near-empty program and SUBTRACTED in adj_ms/adj_ratio — the
    # production chain enqueues all kernels back-to-back in one program
    # and does not pay it per kernel, so raw small-stage ms overstate.
    tiny = jnp.zeros((8, 128), dt)
    overhead_ms, _ = timeit(lambda v: v + dt(1.0), tiny)

    def rec(stage, kernel, fn, *args):
        ms, y = timeit(fn, *args)
        nbytes = tree_bytes(args) + tree_bytes(y)
        gbps = copy_gbps(nbytes)
        floor = nbytes / 1e9 / gbps * 1e3
        adj = max(ms - overhead_ms, 1e-3)
        rows.append({
            "stage": stage, "kernel": kernel,
            "ms": round(ms, 3), "floor_ms": round(floor, 3),
            "ratio": round(ms / floor, 2),
            "adj_ms": round(adj, 3), "adj_ratio": round(adj / floor, 2),
            "overhead_ms": round(overhead_ms, 3),
            "mbytes": round(nbytes / 1e6, 1),
            "achieved_gbps": round(nbytes / 1e9 / (ms / 1e3), 1),
        })
        print(json.dumps(rows[-1]), flush=True)
        return y

    top_res = cfg.encode_res[0]
    enc, syn = params["encoder"], params["synthesis"]
    n_packed = min(5, cfg.log2res - 4)
    packed_res = [top_res >> i for i in range(n_packed)]
    if ff == 2:
        p_enc = {r: fold_stage_params(enc[f"b{r}"]) for r in packed_res}
        p_syn = {r: fold_stage_params(syn[f"b{r}"]) for r in packed_res}
    else:
        p_enc = {r: enc[f"b{r}"] for r in packed_res}
        p_syn = {r: syn[f"b{r}"] for r in packed_res}

    xf = fold(x) if ff == 2 else x
    Nf = xf.shape[0]
    p_et = p_enc[top_res]
    feat_p = {}
    y = jax.jit(lambda xf: ACT(_flat_pw(
        xf, p_et["fromrgb"]["weight"], p_et["fromrgb"]["bias"])))(xf)
    feat_p[top_res] = rec(
        f"enc b{top_res}", "fused_block",
        lambda y: fused_block(
            y, p_et["conv1"]["conv1"]["weight"],
            p_et["conv1"]["conv1"]["bias"],
            p_et["conv1"]["conv2"]["weight"], packed_out=True), y)
    z_p = rec(
        f"enc b{top_res}", "fused_down_block",
        lambda v: fused_down_block(
            v, p_et["conv2"]["conv1"]["weight"],
            p_et["conv2"]["conv1"]["bias"],
            p_et["conv2"]["conv2"]["weight"],
            shape=(Nf, top_res, top_res), packed_out=True), feat_p[top_res])
    for r in packed_res[1:]:
        p_er = p_enc[r]
        feat_p[r] = rec(
            f"enc b{r}", "fused_block_packed",
            lambda v, p_er=p_er, r=r: fused_block_packed(
                v, Nf, r, r,
                p_er["conv1"]["conv1"]["weight"],
                p_er["conv1"]["conv1"]["bias"],
                p_er["conv1"]["conv2"]["weight"]), z_p)
        last = r == packed_res[-1]
        z_p = rec(
            f"enc b{r}", "fused_down_block",
            lambda v, p_er=p_er, r=r, last=last: fused_down_block(
                v, p_er["conv2"]["conv1"]["weight"],
                p_er["conv2"]["conv1"]["bias"],
                p_er["conv2"]["conv2"]["weight"],
                shape=(Nf, r, r), packed_out=not last), feat_p[r])

    # synthesis packed zone (conv1 glue via fused_block_packed / XLA at
    # the lowest stage, then the up-block kernels)
    zz_p = None
    t = None
    for r in reversed(packed_res):
        p_sr = p_syn[r]
        rl = r // 2
        if zz_p is None:
            c_in_low = cfg.ch(rl) * ff
            zz = jnp.asarray(rng.randn(Nf, rl, rl, c_in_low) * 0.3, dt)
            k = p_sr["conv1"]["conv1"]["weight"].shape[0]

            def conv1_low(zz):
                tt = conv2d(zz, p_sr["conv1"]["conv1"]["weight"],
                            padding=k // 2, groups=zz.shape[-1])
                tt = ACT(tt + p_sr["conv1"]["conv1"]["bias"].astype(tt.dtype))
                return conv2d(tt, p_sr["conv1"]["conv2"]["weight"])

            t = jax.jit(conv1_low)(zz)
        else:
            t_flat = rec(
                f"syn b{r}", "fused_block_packed(conv1)",
                lambda v, p_sr=p_sr, rl=rl: fused_block_packed(
                    v, Nf, rl, rl,
                    p_sr["conv1"]["conv1"]["weight"],
                    p_sr["conv1"]["conv1"]["bias"],
                    p_sr["conv1"]["conv2"]["weight"],
                    final_act=False, flat_out=True), zz_p)
            c_r = p_sr["conv1"]["conv2"]["weight"].shape[-1]
            t = t_flat.reshape(Nf, rl, rl, c_r)
        n1 = _noise_for(p_sr["conv1"], r, r)
        n2 = _noise_for(p_sr["conv2"], r, r)
        top = r == top_res
        res_up = rec(
            f"syn b{r}", "fused_up_block",
            lambda t, fp, p_sr=p_sr, n1=n1, n2=n2, top=top: fused_up_block(
                t, fp, n1,
                p_sr["conv2"]["conv1"]["weight"],
                p_sr["conv2"]["conv1"]["bias"],
                p_sr["conv2"]["conv2"]["weight"], n2, packed_out=True,
                w_rgb=p_sr["torgb"]["weight"], b_rgb=p_sr["torgb"]["bias"],
                emit_features=not top, rgb_planar=True), t, feat_p[r])
        zz_p = None if top else res_up[0]
    return rows


def main():
    from migan_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)
    bs512 = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    bs256 = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    out = {
        "migan512": walk_chain(512, bs512),
        "migan256": walk_chain(256, bs256),
    }
    with open("/tmp/stage_floors.json", "wt") as f:
        json.dump(out, f, indent=1)
    worst = max(r["ratio"] for rows in out.values() for r in rows)
    print(json.dumps({"worst_ratio": worst,
                      "file": "/tmp/stage_floors.json"}), flush=True)


if __name__ == "__main__":
    main()
