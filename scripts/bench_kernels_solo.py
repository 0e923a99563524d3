"""Solo kernel timings vs their XLA compositions at in-model shapes.

python scripts/bench_kernels_solo.py [N]   (default N=32 — bs 64 folded)
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from migan_tpu.ops.pallas.upblock import fused_up_block, _xla_up_block
from migan_tpu.ops.pallas.downblock import fused_down_block, _xla_down_block
from migan_tpu.ops.pallas.sepconv import fused_block, _xla_block


def timeit(f, *args, warmup=2, iters=10):
    g = jax.jit(f)

    @jax.jit
    def checksum(y):
        return jnp.sum(y.astype(jnp.float32))

    for _ in range(warmup):
        float(np.asarray(checksum(g(*args))))
    t0 = time.perf_counter()
    y = None
    for _ in range(iters):
        y = g(*args)
    float(np.asarray(checksum(y)))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    C, O = 128, 128
    Hl = Wl = 256

    x_lo = jnp.asarray(rng.randn(N, Hl, Wl, C), dt)
    skip = jnp.asarray(rng.randn(N, 2 * Hl, 2 * Wl, C), dt)
    nz = jnp.asarray(rng.randn(2 * Hl, 2 * Wl) * 0.1, dt)
    w_dw = jnp.asarray(rng.randn(3, 3, 1, C) * 0.3, dt)
    b_dw = jnp.asarray(rng.randn(C), dt)
    w_pw = jnp.asarray(rng.randn(1, 1, C, O) * 0.2, dt)

    gb = (x_lo.nbytes + skip.nbytes + skip.nbytes) / 1e9
    t = timeit(lambda *a: fused_up_block(*a), x_lo, skip, nz, w_dw, b_dw,
               w_pw, nz)
    print(f"up   pallas {t:7.2f} ms   ({gb / (t / 1e3):.0f} GB/s eff)", flush=True)
    t = timeit(lambda *a: _xla_up_block(*a), x_lo, skip, nz, w_dw, b_dw,
               w_pw, nz)
    print(f"up   xla    {t:7.2f} ms", flush=True)

    x = jnp.asarray(rng.randn(N, 2 * Hl, 2 * Wl, C), dt)
    w_pw2 = jnp.asarray(rng.randn(1, 1, C, 2 * O) * 0.2, dt)
    gb = (x.nbytes + x.nbytes // 2) / 1e9
    t = timeit(lambda *a: fused_down_block(*a), x, w_dw, b_dw, w_pw2)
    print(f"down pallas {t:7.2f} ms   ({gb / (t / 1e3):.0f} GB/s eff)", flush=True)
    t = timeit(lambda *a: _xla_down_block(*a), x, w_dw, b_dw, w_pw2)
    print(f"down xla    {t:7.2f} ms", flush=True)

    gb = (x.nbytes * 2) / 1e9
    t = timeit(lambda x_: fused_block(x_, w_dw, b_dw, w_pw), x)
    print(f"sep  pallas {t:7.2f} ms   ({gb / (t / 1e3):.0f} GB/s eff)", flush=True)
    t = timeit(lambda x_: _xla_block(x_, w_dw, b_dw, w_pw, None, None,
                                     None, None), x)
    print(f"sep  xla    {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
