"""A/B: batch-folded XLA path vs Pallas whole-stage path, migan-512 bf16.

Run on real TPU:  python scripts/bench_pallas_ab.py [batch ...]
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from migan_tpu.models.migan_inference import (
    GeneratorConfig, generator_init, generator_apply,
)
from migan_tpu.models.migan_fold import generator_apply_fast
from migan_tpu.models.migan_pallas import generator_apply_pallas


def bench(fn, params, x, warmup=3, iters=10):
    @jax.jit
    def f(params, x):
        return fn(params, x)

    @jax.jit
    def checksum(y):
        return jnp.sum(y.astype(jnp.float32))

    for _ in range(warmup):
        c = float(np.asarray(checksum(f(params, x))))
    t0 = time.perf_counter()
    y = None
    for _ in range(iters):
        y = f(params, x)
    c = float(np.asarray(checksum(y)))
    dt = time.perf_counter() - t0
    return x.shape[0] * iters / dt, c


def main():
    batches = [int(b) for b in sys.argv[1:]] or [64, 128]
    cfg = GeneratorConfig(resolution=512)
    params = generator_init(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.ndim >= 1 else p, params)

    for bs in batches:
        x = jnp.asarray(
            np.random.RandomState(0).randn(bs, 512, 512, 4), jnp.bfloat16)
        for name, fn in (
            ("fold-xla", lambda p, x: generator_apply_fast(p, x, cfg)),
            ("pallas", lambda p, x: generator_apply_pallas(p, x, cfg)),
        ):
            try:
                ips, c = bench(fn, params, x)
                print(f"bs={bs:4d} {name:10s} {ips:8.1f} img/s  "
                      f"(checksum {c:.1f})", flush=True)
            except Exception as e:
                print(f"bs={bs:4d} {name:10s} FAILED: "
                      f"{type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
