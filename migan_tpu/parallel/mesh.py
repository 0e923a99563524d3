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
    """Device_put a host batch with the batch dim sharded over `axis`."""
    s = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params / optimizer state) across the mesh."""
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
