"""Training step: runs, updates params, EMA tracks, R1 double-grad works,
and the whole step executes sharded over an 8-device CPU mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp

from migan_tpu.models.migan import MiganConfig
from migan_tpu.train.train_step import (
    TrainConfig, OptConfig, init_train_state, make_train_step,
)
from migan_tpu.train.loss import LossConfig, KDConfig
from migan_tpu.parallel.mesh import make_mesh, shard_batch, replicate

CFG_G = MiganConfig(resolution=16, depthwise=True, reparametrize=True,
                    num_reparam_tensors=2)
CFG_D = MiganConfig(resolution=16, depthwise=True, reparametrize=True,
                    num_reparam_tensors=2)
TCFG = TrainConfig(batch_size=8,
                   g_opt=OptConfig(reg_interval=4),
                   d_opt=OptConfig(reg_interval=16),
                   loss=LossConfig(r1_gamma=10.0))


def _batch(n=8, res=16, seed=0):
    rng = np.random.RandomState(seed)
    real = rng.rand(n, res, res, 3).astype(np.float32) * 2 - 1
    mask = (rng.rand(n, res, res, 1) > 0.4).astype(np.float32)
    return {"real": jnp.asarray(real), "mask": jnp.asarray(mask)}


def _tree_l2_diff(a, b):
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    return sum(float(jnp.sum(jnp.abs(x - y))) for x, y in
               zip(leaves_a, leaves_b))


def test_train_step_updates_params_and_ema():
    state = init_train_state(jax.random.PRNGKey(0), CFG_G, CFG_D, TCFG)
    step = make_train_step(CFG_G, CFG_D, TCFG)
    batch = _batch()
    new_state, stats = step(state, batch, jax.random.PRNGKey(1),
                            do_dr1=False)
    assert int(new_state.step) == 1 and int(new_state.nimg) == 8
    assert _tree_l2_diff(new_state.params_G, state.params_G) > 0
    assert _tree_l2_diff(new_state.params_D, state.params_D) > 0
    # EMA moved but less than params
    assert 0 < _tree_l2_diff(new_state.params_G_ema, state.params_G_ema)
    for k in ("Loss/G/loss", "Loss/D/loss", "Loss/scores/real"):
        assert np.isfinite(float(stats[k]))

    # noise_const buffers must not train
    nc0 = state.params_G["synthesis"]["b8"]["conv1"]["conv2"]["noise_const"]
    nc1 = new_state.params_G["synthesis"]["b8"]["conv1"]["conv2"][
        "noise_const"]
    np.testing.assert_array_equal(np.asarray(nc0), np.asarray(nc1))


def test_train_step_with_r1():
    state = init_train_state(jax.random.PRNGKey(0), CFG_G, CFG_D, TCFG)
    step = make_train_step(CFG_G, CFG_D, TCFG)
    new_state, stats = step(state, _batch(), jax.random.PRNGKey(1),
                            do_dr1=True)
    assert np.isfinite(float(stats["Loss/r1_penalty"]))
    assert float(stats["Loss/r1_penalty"]) > 0


def test_train_step_with_kd_teacher():
    """KD against a stand-in teacher producing per-res torgb outputs."""
    def fake_teacher(x, rng):
        outs = {}
        n = x.shape[0]
        for res in (4, 8, 16):
            outs[res] = jnp.zeros((n, res, res, 3), x.dtype)
        return outs[16], {"res_to_rgb": outs}

    tcfg = TrainConfig(batch_size=8, loss=LossConfig(
        r1_gamma=10.0, kd=KDConfig(start_resolution=8, weight=2.0)))
    state = init_train_state(jax.random.PRNGKey(0), CFG_G, CFG_D, tcfg)
    step = make_train_step(CFG_G, CFG_D, tcfg, teacher_fn=fake_teacher)
    _, stats = step(state, _batch(), jax.random.PRNGKey(1), do_dr1=False)
    assert float(stats["Loss/G/kd_l1_image_level_loss"]) > 0


def test_grad_accum_matches_full_batch():
    """Accumulated micro-batch grads == full-batch grads on a deterministic
    phase (R1; mbstd groups of 4 align between batch 8 and 2 rounds of 4,
    so the equality is exact up to float reassociation)."""
    from migan_tpu.train.train_step import _accum_grads
    from migan_tpu.train import loss as losses
    from migan_tpu.models.migan import discriminator_init

    params_D = discriminator_init(jax.random.PRNGKey(3), CFG_D)
    b = _batch()
    real, mask = b["real"], b["mask"]

    def fn(p, x, m):
        return losses.d_r1_loss(p, x, m, CFG_D, 10.0)

    g1, s1 = _accum_grads(fn, params_D, (real, mask), 1)
    g2, s2 = _accum_grads(fn, params_D, (real, mask), 2)
    for a, b_ in zip(jax.tree_util.tree_leaves(g1),
                     jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(s1["Loss/r1_penalty"]),
                               float(s2["Loss/r1_penalty"]), rtol=1e-4)


def test_train_step_with_grad_accum_on_mesh():
    """grad_accum_rounds=2 runs sharded end-to-end (scan over micro-batches
    under GSPMD) and still updates params."""
    mesh = make_mesh()
    tcfg = TrainConfig(batch_size=8, loss=LossConfig(r1_gamma=10.0),
                       grad_accum_rounds=2)
    state = init_train_state(jax.random.PRNGKey(0), CFG_G, CFG_D, tcfg)
    state = replicate(state, mesh)
    batch = shard_batch(_batch(), mesh)
    step = make_train_step(CFG_G, CFG_D, tcfg)
    new_state, stats = step(state, batch, jax.random.PRNGKey(1), do_dr1=True)
    assert np.isfinite(float(stats["Loss/G/loss"]))
    assert np.isfinite(float(stats["Loss/r1_penalty"]))
    assert _tree_l2_diff(new_state.params_G, state.params_G) > 0


def test_train_step_on_8_device_mesh():
    """The full DP story: batch sharded over 8 CPU devices, params
    replicated — grads all-reduced by the partitioner."""
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    state = init_train_state(jax.random.PRNGKey(0), CFG_G, CFG_D, TCFG)
    state = replicate(state, mesh)
    batch = shard_batch(_batch(), mesh)
    step = make_train_step(CFG_G, CFG_D, TCFG)
    new_state, stats = step(state, batch, jax.random.PRNGKey(1), do_dr1=True)
    assert np.isfinite(float(stats["Loss/G/loss"]))
    # params stay replicated
    w = new_state.params_G["encoder"]["b16"]["conv1"]["conv1"]["w_stack"]
    assert w.sharding.is_fully_replicated


def test_train_step_bf16_policy():
    """compute_dtype='bfloat16': f32 master params, bf16 model compute.

    The step must run all phases (incl. the R1 double-grad), keep the
    params f32, produce finite losses close to the f32 policy's on the
    same inputs, and still freeze noise_const buffers.
    """
    tcfg16 = TrainConfig(batch_size=8,
                         g_opt=OptConfig(reg_interval=4),
                         d_opt=OptConfig(reg_interval=16),
                         loss=LossConfig(r1_gamma=10.0,
                                         compute_dtype="bfloat16"))
    state = init_train_state(jax.random.PRNGKey(0), CFG_G, CFG_D, tcfg16)
    step16 = make_train_step(CFG_G, CFG_D, tcfg16)
    step32 = make_train_step(CFG_G, CFG_D, TCFG)
    batch = _batch()
    ns16, st16 = step16(state, batch, jax.random.PRNGKey(1), do_dr1=True)
    ns32, st32 = step32(state, batch, jax.random.PRNGKey(1), do_dr1=True)

    # master weights stay f32 and actually moved
    for leaf in jax.tree_util.tree_leaves(ns16.params_G):
        assert leaf.dtype == jnp.float32
    assert _tree_l2_diff(ns16.params_G, state.params_G) > 0
    assert _tree_l2_diff(ns16.params_D, state.params_D) > 0

    # losses finite and near the f32 policy (bf16 has ~3 decimal digits)
    for k in ("Loss/G/loss", "Loss/D/loss", "Loss/r1_penalty"):
        v16, v32 = float(st16[k]), float(st32[k])
        assert np.isfinite(v16), k
        assert abs(v16 - v32) <= 0.05 * max(1.0, abs(v32)), (k, v16, v32)

    nc0 = state.params_G["synthesis"]["b8"]["conv1"]["conv2"]["noise_const"]
    nc1 = ns16.params_G["synthesis"]["b8"]["conv1"]["conv2"]["noise_const"]
    np.testing.assert_array_equal(np.asarray(nc0), np.asarray(nc1))
