"""Device mesh + sharding helpers — the distributed layer.

TPU-native replacement for the reference's NCCL/DDP stack (SURVEY.md §2.9):
process groups, DDP wraps, gradient hooks, rank-0 broadcasts and hand-rolled
all-gathers all collapse into a jax.sharding.Mesh + NamedSharding:

  - data parallel: batch sharded on the 'data' axis, params replicated;
    XLA partitions the grads' psum onto ICI automatically.
  - training stats: jnp.mean over the global batch IS the all_reduce.
  - sampler order: same PRNG key on all hosts replaces the reference's
    rank-0 randperm broadcast (reference lib/data_factory/common/ds_sampler.py:77-85).
  - multi-host: call jax.distributed.initialize() once (reference needed a
    TCP rendezvous per GPU set, run.sh:28-96).

The mesh is 1-D for MI-GAN (a 5.9M-param model: TP/PP are documented N/A,
SURVEY.md §2.9); the helpers accept arbitrary axis layouts so larger meshes
(e.g. ('data','model')) work unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Dict[str, int] | None = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a mesh; default 1-D 'data' axis over all devices."""
    devices = list(devices if devices is not None else jax.devices())
    if axes is None:
        axes = {"data": len(devices)}
    names = tuple(axes.keys())
    shape = tuple(axes.values())
    assert int(np.prod(shape)) == len(devices), (shape, len(devices))
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def shard_batch(batch: Dict[str, Any], mesh: Mesh,
                axis: str = "data") -> Dict[str, Any]:
    """Build the global sharded batch from this host's data.

    Single-host: a device_put with the batch dim sharded over `axis`.
    Multi-host (jax.process_count() > 1): `batch` is the PER-HOST shard
    (global_batch / process_count rows, produced by a rank-strided
    sampler); jax.make_array_from_process_local_data assembles the global
    array without any cross-host transfer — the TPU-native replacement for
    the reference's per-rank DataLoader + NCCL all-gather
    (reference: lib/data_factory/common/ds_sampler.py, lib/utils.py:41-46).
    """
    s = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                s, np.asarray(x)), batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def spatial_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the image HEIGHT dim of an NHWC batch — the sequence-parallel
    analog for a convolutional model (SURVEY §2.9/§5.7: the reference's
    "sequence length" is image resolution and it has no sharding story;
    its app-level answer to big images is the pipeline's bbox crop).

    Usage: `x = jax.device_put(x, spatial_sharding(mesh))` with replicated
    params, then call the standard jitted forward — GSPMD partitions every
    conv/FIR op along H and inserts the halo exchanges for the 3x3 / 4-tap
    stencils automatically (validated for the full migan inference net on
    an 8-device mesh, tests/test_multihost.py::test_spatial_sharded_inference
    — exact parity, output stays H-sharded). Lets one image exceed a single
    chip's HBM (megapixel inpainting) at the cost of per-stage halo
    traffic; for throughput-bound batched serving, prefer batch DP."""
    return NamedSharding(mesh, P(None, axis, None, None))


def shard_batch_stacked(batch: Dict[str, Any], mesh: Mesh,
                        axis: str = "data") -> Dict[str, Any]:
    """shard_batch for [k, N, ...] stacks of k per-call batches (the
    make_fused_train_step input): the step axis is replicated, the batch
    axis (dim 1) sharded over `axis`; multi-host assembly as in
    shard_batch."""
    s = NamedSharding(mesh, P(None, axis))
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                s, np.asarray(x)), batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def maybe_initialize_distributed() -> bool:
    """Env-gated multi-host init (idempotent). Set MIGAN_TPU_MULTIHOST=1
    with the standard JAX coordination env (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID, or cloud auto-detection) before
    launching one process per host. Replaces the reference's TCP rendezvous
    + mp.spawn launcher (reference: run.sh:28-96, main.py:13-35)."""
    import os

    if os.environ.get("MIGAN_TPU_MULTIHOST", "") not in ("", "0"):
        if jax.process_count() == 1:  # not already initialized
            jax.distributed.initialize()
        return True
    return False


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params / optimizer state) across the mesh."""
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
