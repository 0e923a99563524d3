"""Tile-size sweep for the three Pallas kernels at in-model migan-512
shapes (bs=128 folded: N=64, C=128). Run on real TPU.

python scripts/bench_tile_sweep.py
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from migan_tpu.ops.pallas.sepconv import fused_block
from migan_tpu.ops.pallas.upblock import fused_up_block
from migan_tpu.ops.pallas.downblock import fused_down_block


def timeit(f, *args, warmup=2, iters=8, **kw):
    @jax.jit
    def checksum(y):
        return jnp.sum(y.astype(jnp.float32))

    for _ in range(warmup):
        float(np.asarray(checksum(f(*args, **kw))))
    t0 = time.perf_counter()
    y = None
    for _ in range(iters):
        y = f(*args, **kw)
    float(np.asarray(checksum(y)))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    N, H, W, C, O = 64, 512, 512, 128, 128
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.randn(N, H, W, C), dt)
    w_dw = jnp.asarray(rng.randn(3, 3, 1, C) * 0.3, dt)
    b_dw = jnp.asarray(rng.randn(C), dt)
    w_pw = jnp.asarray(rng.randn(1, 1, C, O) * 0.2, dt)

    gb_fb = 2 * x.nbytes / 1e9
    for th in (0, 4096, 8192, 16384, 32768):
        ms = timeit(fused_block, x, w_dw, b_dw, w_pw,
                    packed_out=True, tile_hint=th)
        print(f"fused_block  tile={th or 'auto':>6}  {ms:7.2f} ms "
              f"({gb_fb / (ms / 1e3):.0f} GB/s)", flush=True)

    Hl = Wl = 256
    x_lo = jnp.asarray(rng.randn(N, Hl, Wl, C), dt)
    skip2d = jnp.asarray(rng.randn(N * 2 * Hl * Wl, 2 * C), dt)
    nz = jnp.asarray(rng.randn(2 * Hl, 2 * Wl) * 0.1, dt)
    gb_up = (x_lo.nbytes + 2 * skip2d.nbytes) / 1e9
    for tr in (4, 8, 16):
        ms = timeit(fused_up_block, x_lo, skip2d, nz, w_dw, b_dw, w_pw, nz,
                    tile_rows=tr, packed_out=True)
        print(f"up_block     rows={tr:>6}  {ms:7.2f} ms "
              f"({gb_up / (ms / 1e3):.0f} GB/s)", flush=True)

    xp = jnp.asarray(rng.randn(N * H * (W // 2), 2 * C), dt)
    w_pw2 = jnp.asarray(rng.randn(1, 1, C, 2 * O) * 0.2, dt)
    gb_dn = 1.5 * xp.nbytes / 1e9
    for tr in (4, 8, 16):
        ms = timeit(fused_down_block, xp, w_dw, b_dw, w_pw2,
                    tile_rows=tr, shape=(N, H, W))
        print(f"down_block   rows={tr:>6}  {ms:7.2f} ms "
              f"({gb_dn / (ms / 1e3):.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
