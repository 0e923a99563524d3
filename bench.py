"""Headline benchmark: MI-GAN-512 batched inference throughput per chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Baseline (BASELINE.json north star): >= 2000 images/sec on a v5e-8 slice,
i.e. 250 images/sec/chip. The model forward is the pure generator
(4-ch NHWC in, 3-ch RGB out), matching the paper's timing methodology
(reference README.md:231 — pure model, no pipeline pre/post).
"""

import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_PER_CHIP = 2000.0 / 8.0  # north-star 2000 img/s on v5e-8


def bench_migan512(batch_sizes=(16, 32, 64, 128), warmup=3, iters=10):
    import jax
    import jax.numpy as jnp
    from migan_tpu.models.migan_inference import (
        GeneratorConfig, generator_init,
    )

    from migan_tpu.models.migan_pallas import generator_apply_pallas

    cfg = GeneratorConfig(resolution=512)
    params = generator_init(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.ndim >= 1 else p, params)

    @jax.jit
    def fwd(params, x):
        # batch-folded + whole-stage Pallas ladder (parity-tested vs
        # generator_apply; 715 vs 468 img/s for the folded-XLA path)
        return generator_apply_pallas(params, x, cfg)

    import numpy as np

    @jax.jit
    def checksum(y):
        return jnp.sum(y.astype(jnp.float32))

    best = 0.0
    best_bs = None
    for bs in batch_sizes:
        try:
            x = jnp.zeros((bs, 512, 512, 4), jnp.bfloat16)
            for _ in range(warmup):
                # NOTE: block_until_ready is unreliable through the remote
                # PJRT tunnel; a scalar host fetch is the only true sync.
                float(np.asarray(checksum(fwd(params, x))))
            t0 = time.perf_counter()
            y = None
            for _ in range(iters):
                y = fwd(params, x)
            # device stream is FIFO: syncing on the last call's checksum
            # bounds the completion of all `iters` executions.
            float(np.asarray(checksum(y)))
            dt = time.perf_counter() - t0
            ips = bs * iters / dt
        except Exception as e:  # OOM at large batch etc.
            print(f"# batch {bs}: {type(e).__name__}", file=sys.stderr)
            continue
        print(f"# batch {bs}: {ips:.1f} img/s", file=sys.stderr)
        if ips > best:
            best, best_bs = ips, bs
    return best, best_bs


def bench_migan256(batch_sizes=(128, 256), warmup=3, iters=10):
    """The reference's primary (mobile) model at 256 res: the packed
    Pallas chain runs UNFOLDED there (c_top = 128 fills the lanes
    directly; models/migan_pallas._fold_factor). Measured 1595 vs 1127
    img/s for the standard XLA path at bs=256 (which OOMs at bs=512)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from migan_tpu.models.migan_inference import (
        GeneratorConfig, generator_init,
    )
    from migan_tpu.models.migan_pallas import generator_apply_pallas

    cfg = GeneratorConfig(resolution=256)
    params = generator_init(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.ndim >= 1 else p, params)

    @jax.jit
    def fwd(params, x):
        return generator_apply_pallas(params, x, cfg)

    @jax.jit
    def checksum(y):
        return jnp.sum(y.astype(jnp.float32))

    best = 0.0
    for bs in batch_sizes:
        try:
            x = jnp.zeros((bs, 256, 256, 4), jnp.bfloat16)
            for _ in range(warmup):
                float(np.asarray(checksum(fwd(params, x))))
            t0 = time.perf_counter()
            y = None
            for _ in range(iters):
                y = fwd(params, x)
            float(np.asarray(checksum(y)))
            best = max(best, bs * iters / (time.perf_counter() - t0))
        except Exception as e:  # compile OOM at large batch
            print(f"# 256 batch {bs}: {type(e).__name__}", file=sys.stderr)
    return best


def bench_latency_p50(iters=30):
    """p50 single-image latency (bs=1), the BASELINE.json secondary metric."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from migan_tpu.models.migan_inference import (
        GeneratorConfig, generator_init,
    )
    from migan_tpu.models.migan_fold import generator_apply_fast

    cfg = GeneratorConfig(resolution=512)
    params = generator_init(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.ndim >= 1 else p, params)

    @jax.jit
    def fwd(params, x):
        return jnp.sum(generator_apply_fast(params, x, cfg)
                       .astype(jnp.float32))

    x = jnp.zeros((1, 512, 512, 4), jnp.bfloat16)
    float(np.asarray(fwd(params, x)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(np.asarray(fwd(params, x)))
        ts.append((time.perf_counter() - t0) * 1000)
    return float(np.median(ts))


def bench_train_step(res=256, bs=32, warmup=2, iters=4, steps_per_call=8):
    """Training throughput, reference flagship config: migan-256 dw+reparam
    G / D, NS + R1 at the reference's lazy-reg schedule (d_reg_interval=16,
    configs/experiment/migan_places256.yaml) on one chip, with the
    TPU-idiomatic bf16 compute policy (f32 master weights + Adam moments;
    LossConfig.compute_dtype — measured 2.2x f32 and loss-parity within 5%
    in tests/test_train_step.py::test_train_step_bf16_policy).

    Uses make_fused_train_step: ONE program scanning `steps_per_call`
    optimizer steps per dispatch (state donated in place) — throughput-
    parity with the per-phase path (the step is device-bound; measured
    160 vs 158 ms/step), but one dispatch per k steps keeps the tunnel
    out of the loop. R1 runs inside via lax.cond on state.step % 16 == 0;
    timing spans iters*steps_per_call steps = exactly iters/2 R1 rounds,
    the schedule's amortized share. Parity with the per-phase path is
    tested in tests/test_train_step.py::test_fused_multi_step_matches_sequential.

    The reference schedule is GLOBAL batch 32 on 8 GPUs = 4 per device
    (BASELINE.md); this sweeps down from 32 to the largest batch that
    compiles on one chip."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from migan_tpu.models.migan import MiganConfig
    from migan_tpu.train.train_step import (
        TrainConfig, init_train_state, make_fused_train_step,
    )
    from migan_tpu.train.loss import LossConfig

    g_cfg = MiganConfig(resolution=res, depthwise=True, reparametrize=True,
                        num_reparam_tensors=9)
    d_cfg = MiganConfig(resolution=res)

    last_err = None
    b = bs
    k = steps_per_call
    while b >= 2:
        try:
            tcfg = TrainConfig(batch_size=b,
                               loss=LossConfig(r1_gamma=10.0,
                                               compute_dtype="bfloat16"))
            state = init_train_state(jax.random.PRNGKey(0), g_cfg, d_cfg,
                                     tcfg)
            step = make_fused_train_step(g_cfg, d_cfg, tcfg,
                                         steps_per_call=k)
            batch = {
                "real": jnp.zeros((k, b, res, res, 3), jnp.float32),
                "mask": jnp.ones((k, b, res, res, 1), jnp.float32),
            }
            rngs = jax.random.split(jax.random.PRNGKey(1), k)
            for _ in range(warmup):  # covers both R1 branch states
                state, stats = step(state, batch, rngs)
                float(np.asarray(stats["Loss/G/loss"][-1]))
            t0 = time.perf_counter()
            for i in range(iters):
                state, stats = step(state, batch, rngs)
            float(np.asarray(stats["Loss/G/loss"][-1]))
            return b * k * iters / (time.perf_counter() - t0)
        except Exception as e:  # compile OOM at this batch — halve
            print(f"# train bs {b}: {type(e).__name__}", file=sys.stderr)
            last_err = e
            b //= 2
    raise last_err


def _probe_backend(timeout_s: int = 300) -> bool:
    """Fail fast when the remote TPU tunnel is down: backend init hangs
    indefinitely in-process (observed), so probe it in a bounded
    subprocess first and emit a diagnostic JSON line instead of hanging
    the driver."""
    import subprocess

    code = ("import jax, numpy as np, jax.numpy as jnp;"
            "print(float(np.asarray(jax.jit(lambda x: jnp.sum(x + 1))"
            "(jnp.ones((8, 128))))))")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, timeout=timeout_s)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    # Persistent XLA compilation cache: the 5 bench sections carry 20-40 s
    # first-compiles each; cached re-runs spend their budget measuring.
    from migan_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    if not _probe_backend():
        print(json.dumps({
            "metric": "migan512_inference_throughput",
            "value": 0.0,
            "unit": "images/sec/chip",
            "vs_baseline": 0.0,
            "error": "TPU backend unreachable (device init timed out; "
                     "known-good 715 img/s as of 2026-08-17, see "
                     "ROADMAP.md)",
        }))
        sys.exit(1)
    value, bs = bench_migan512()
    extra = {}
    try:
        extra["p50_latency_ms"] = round(bench_latency_p50(), 2)
    except Exception as e:  # pragma: no cover
        print(f"# latency bench failed: {type(e).__name__}", file=sys.stderr)
    try:
        extra["migan256_imgs_per_sec"] = round(bench_migan256(), 2)
    except Exception as e:  # pragma: no cover
        print(f"# 256 bench failed: {type(e).__name__}", file=sys.stderr)
    try:
        extra["train_imgs_per_sec"] = round(bench_train_step(), 2)
    except Exception as e:  # pragma: no cover
        print(f"# train bench failed: {type(e).__name__}", file=sys.stderr)
    try:
        # 512 finetune config (reference migan_places512.yaml, 25,000 kimg
        # schedule). Standard path: batch-folding the training nets' top
        # stage (ch(512)=64, half a lane) was measured 1.85x SLOWER (16.5
        # vs 30.5 img/s, bs=8 bf16) — the tile/block-diag weight expansion
        # runs inside the differentiated graph every step, unlike inference
        # where the folded weights are precomputed once — so it was retired
        # (ROADMAP.md #3).
        extra["train512_imgs_per_sec"] = round(
            bench_train_step(res=512, bs=8), 2)
    except Exception as e:  # pragma: no cover
        print(f"# train512 bench failed: {type(e).__name__}", file=sys.stderr)
    print(json.dumps({
        "metric": "migan512_inference_throughput",
        "value": round(value, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / BASELINE_PER_CHIP, 3),
        "batch_size": bs,
        **extra,
    }))


if __name__ == "__main__":
    main()
