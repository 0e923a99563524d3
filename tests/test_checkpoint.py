"""Orbax checkpoint round-trip for the full TrainState."""

import numpy as np
import jax

from migan_tpu.models.migan import MiganConfig
from migan_tpu.train.train_step import TrainConfig, init_train_state
from migan_tpu.train import checkpoint as ckpt


def test_checkpoint_roundtrip(tmp_path):
    cfg = MiganConfig(resolution=32, depthwise=True, reparametrize=True,
                      num_reparam_tensors=2)
    state = init_train_state(jax.random.PRNGKey(0), cfg, cfg,
                             TrainConfig(batch_size=4))
    path = ckpt.save(str(tmp_path), 7, state)
    assert ckpt.latest(str(tmp_path)) == path

    # restore into a freshly-initialized template with different values
    template = init_train_state(jax.random.PRNGKey(1), cfg, cfg,
                                TrainConfig(batch_size=4))
    restored = ckpt.restore(path, template)
    a = jax.tree_util.tree_leaves(state)
    b = jax.tree_util.tree_leaves(restored)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
