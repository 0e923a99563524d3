"""Capture a device trace of the migan-512 fast path and print the per-op
time breakdown (top HLO ops by self-time).

python scripts/profile_fwd.py [batch] [path]   path in {fold, pallas, std}
"""
import glob
import gzip
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    which = sys.argv[2] if len(sys.argv) > 2 else "fold"

    from migan_tpu.models.migan_inference import (
        GeneratorConfig, generator_init, generator_apply,
    )
    from migan_tpu.models.migan_fold import generator_apply_fast
    from migan_tpu.models.migan_pallas import generator_apply_pallas

    fn = {"fold": generator_apply_fast, "pallas": generator_apply_pallas,
          "std": generator_apply}[which]
    cfg = GeneratorConfig(resolution=512)
    params = generator_init(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.ndim >= 1 else p, params)

    @jax.jit
    def f(params, x):
        return jnp.sum(fn(params, x, cfg).astype(jnp.float32))

    x = jnp.asarray(np.random.RandomState(0).randn(bs, 512, 512, 4),
                    jnp.bfloat16)
    for _ in range(3):
        float(np.asarray(f(params, x)))

    logdir = "/tmp/migan_trace"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for _ in range(3):
        y = f(params, x)
    float(np.asarray(y))
    jax.profiler.stop_trace()

    # Parse the xplane protobuf: aggregate device-side event durations.
    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    assert paths, "no trace captured"
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    xs = xplane_pb2.XSpace()
    with open(paths[0], "rb") as fh:
        xs.ParseFromString(fh.read())

    tot = defaultdict(float)
    device_total = 0.0
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":   # "Async XLA Ops" overlap compute
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e9  # ms
                tot[name] += dur
                device_total += dur
    items = sorted(tot.items(), key=lambda kv: -kv[1])
    print(f"device op time total: {device_total:.2f} ms over 3 iters "
          f"({device_total / 3:.2f} ms/iter)")
    for name, ms in items[:40]:
        print(f"{ms / 3:9.3f} ms  {100 * ms / device_total:5.1f}%  {name}")


if __name__ == "__main__":
    main()
