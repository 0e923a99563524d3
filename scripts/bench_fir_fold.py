"""A/B: up2-FIR as VPU stencil (status quo) vs MXU phase fold.

Measures, at the migan-512 folded top-stage geometry (and the stage
below), the judge-prescribed export-time fold — pointwise conv + up2-FIR
stencil replaced by 4 phase-weighted 2x2 convs (ops/conv.pw_up2_phase,
16x the pointwise MACs, all MXU) + a lane-slice kernel step
(fused_up_block(phase_input=True)) — against the shipping subchain
[flat pw matmul -> fused_up_block with the in-kernel FIR].

Also times each piece alone, so the kernel-only delta (D vs C) cleanly
measures what step 1's stencil arithmetic costs on the VPU, separate
from the producer's added MXU work and the 4x x-tensor bytes.

python scripts/bench_fir_fold.py          # real TPU
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from migan_tpu.ops.conv import pw_up2_phase
from migan_tpu.ops.pallas.upblock import fused_up_block


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
    return (time.perf_counter() - t0) / iters * 1000


def bench_stage(name, Nf, Hl, Wl, Ci, C, O, dt=jnp.bfloat16):
    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.randn(Nf, Hl, Wl, Ci), dt)           # dw-act out
    w_pw1 = jnp.asarray(rng.randn(Ci, C) * 0.1, dt)          # conv1 pw
    skip = jnp.asarray(rng.randn(Nf, 2 * Hl, 2 * Wl, C), dt)
    nz_up = jnp.asarray(rng.randn(2 * Hl, 2 * Wl) * 0.1, jnp.float32)
    w_dw = jnp.asarray(rng.randn(3, 3, 1, C) * 0.1, dt)
    b_dw = jnp.asarray(rng.randn(C) * 0.1, dt)
    w_pw = jnp.asarray(rng.randn(C, O) * 0.1, dt)
    nz2 = jnp.asarray(rng.randn(2 * Hl, 2 * Wl) * 0.1, jnp.float32)

    def pw(y):
        n, h, w, c = y.shape
        return (y.reshape(-1, c) @ w_pw1).reshape(n, h, w, C)

    # NOTE: the big tensors (y, skip — skip is ~1 GB at full batch) are
    # traced ARGUMENTS everywhere; closing over them bakes them into the
    # program as constants and the remote-compile RPC ships the bytes
    # (measured: wedged the compile service for 20+ min, then broke the
    # pipe). Weights/noise are small and fine as closure constants.
    def chain_a(y, skip):    # status quo: pw matmul + stencil kernel
        return fused_up_block(pw(y), skip, nz_up, w_dw, b_dw, w_pw, nz2,
                              packed_out=True)

    def chain_b(y, skip):    # fold: 4 phase convs + lane-slice kernel
        return fused_up_block(pw_up2_phase(y, w_pw1), skip, nz_up,
                              w_dw, b_dw, w_pw, nz2, packed_out=True,
                              phase_input=True)

    def chain_b2(y, skip):   # fold, single packed 3x3 conv producer
        return fused_up_block(pw_up2_phase(y, w_pw1, packed=True), skip,
                              nz_up, w_dw, b_dw, w_pw, nz2,
                              packed_out=True, phase_input=True)

    x_lo = jax.jit(pw)(y)
    x4 = jax.jit(lambda y: pw_up2_phase(y, w_pw1))(y)

    out = {"geometry": dict(Nf=Nf, Hl=Hl, Wl=Wl, Ci=Ci, C=C, O=O)}

    def rec(key, fn, *args):
        out[key] = round(timeit(fn, *args), 2)
        print(name, key, out[key], "ms", flush=True)

    # smallest programs first: a remote-compile hiccup loses the least
    rec("pw_only_ms", pw, y)
    rec("phaseconv_only_ms", lambda y: pw_up2_phase(y, w_pw1), y)
    rec("phaseconv_packed_only_ms",
        lambda y: pw_up2_phase(y, w_pw1, packed=True), y)
    rec("C_kernel_only_stencil_ms",
        lambda x, s: fused_up_block(x, s, nz_up, w_dw, b_dw, w_pw, nz2,
                                    packed_out=True), x_lo, skip)
    rec("D_kernel_only_slice_ms",
        lambda x, s: fused_up_block(x, s, nz_up, w_dw, b_dw, w_pw, nz2,
                                    packed_out=True, phase_input=True),
        x4, skip)
    rec("A_pw_plus_stencil_kernel_ms", chain_a, y, skip)
    rec("B_phaseconv_plus_slice_kernel_ms", chain_b, y, skip)
    rec("B2_packedconv_variant_ms", chain_b2, y, skip)
    print(name, json.dumps(out), flush=True)
    return out


def main():
    from migan_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)
    # migan-512 folded top stage: bs128 -> Nf=64; Nf=16 keeps HBM headroom
    # (per-row cost is batch-invariant at these sizes, as in bench.py's
    # vpu_floor section)
    r = {}
    r["top512"] = bench_stage("top512", 16, 256, 256, 256, 128, 128)
    # the stage below (r=256 in the packed ladder): lo 128, C=128
    r["mid256"] = bench_stage("mid256", 16, 128, 128, 256, 128, 128)
    with open("/tmp/bench_fir_fold.json", "wt") as f:
        json.dump(r, f, indent=1)
    print("wrote /tmp/bench_fir_fold.json", flush=True)


if __name__ == "__main__":
    main()
