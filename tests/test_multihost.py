"""Multi-host wiring — the pieces validatable on a single host.

True multi-process validation needs real multi-host hardware; these tests
pin the single-host-visible contracts: the rank-strided sampler shards
cover/partition the data, the eval zipzap reassembly restores item order,
and the global-batch assembly API (make_array_from_process_local_data)
produces exactly the device_put sharding on the 8-virtual-device mesh.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from migan_tpu.data.sampler import ShardSampler
from migan_tpu.parallel.mesh import (
    make_mesh, batch_sharding, shard_batch, maybe_initialize_distributed,
)


def test_shard_sampler_extend_covers_and_interleaves():
    n, P = 103, 4
    shards = [ShardSampler(n, num_shards=P, shard=s, shuffle=False,
                           extend=True).epoch_indices(0) for s in range(P)]
    m = len(shards[0])
    assert all(len(s) == m for s in shards)
    # zipzap reassembly (cli/evaluate.py): stack -> transpose -> flatten
    g = np.stack(shards)                     # [P, m]
    re = np.swapaxes(g, 0, 1).reshape(-1)[:n]
    np.testing.assert_array_equal(re, np.arange(n))


def test_train_sampler_shards_partition():
    n, P = 64, 8
    epochs = [ShardSampler(n, num_shards=P, shard=s, shuffle=True,
                           seed=3).epoch_indices(5) for s in range(P)]
    allidx = np.concatenate(epochs)
    assert sorted(allidx.tolist()) == list(range(n))


def test_global_batch_assembly_matches_device_put():
    mesh = make_mesh()
    s = batch_sharding(mesh)
    x = np.random.RandomState(0).randn(16, 4, 4, 3).astype(np.float32)
    a = jax.make_array_from_process_local_data(s, x)  # multi-host API
    b = jax.device_put(x, s)                          # single-host path
    assert a.sharding == b.sharding
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # shard_batch routes to device_put when process_count == 1
    out = shard_batch({"real": x}, mesh)
    np.testing.assert_array_equal(np.asarray(out["real"]), x)


def test_maybe_initialize_distributed_gated(monkeypatch):
    monkeypatch.delenv("MIGAN_TPU_MULTIHOST", raising=False)
    assert maybe_initialize_distributed() is False
    monkeypatch.setenv("MIGAN_TPU_MULTIHOST", "0")
    assert maybe_initialize_distributed() is False


@pytest.mark.slow
def test_spatial_sharded_inference():
    """Spatial (H-dim) sharding — the SP analog: GSPMD partitions the full
    inference forward along image height with halo exchanges for the
    stencils; exact parity vs unsharded, output stays H-sharded."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from migan_tpu.models import migan_inference as mi
    from migan_tpu.parallel.mesh import make_mesh, replicate, spatial_sharding

    cfg = mi.GeneratorConfig(resolution=64)
    params = mi.generator_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 128, 128, 4),
                    jnp.float32)
    want = np.asarray(mi.generator_apply(params, x, cfg))

    mesh = make_mesh()
    xs = jax.device_put(x, spatial_sharding(mesh))
    ps = replicate(params, mesh)
    got = jax.jit(lambda p, xx: mi.generator_apply(p, xx, cfg))(ps, xs)
    assert "data" in str(got.sharding.spec)   # stays H-sharded
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
