"""Training step: runs, updates params, EMA tracks, R1 double-grad works,
and the whole step executes sharded over an 8-device CPU mesh.
"""

import numpy as np
import pytest
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_fused_multi_step_matches_sequential():
    """make_fused_train_step(k) == k sequential make_train_step calls —
    params, EMA, opt moments, step/nimg — with the same per-step keys and
    the same R1 schedule (state.step % d_reg_interval == 0).

    Runs BOTH paths under jax.disable_jit(): jitted, the fused program and
    the four per-phase programs are different XLA compilations whose
    fusion/association rounding differs by a few ulps, and Adam's
    g/sqrt(v) update amplifies that chaotically on near-zero-gradient
    elements (measured up to ~9e-3 after 4 steps) — eager mode runs the
    identical per-op kernels in both paths, so equality is exact and the
    test verifies exactly what is at risk: the scan/cond/rng/schedule
    mechanics. test_fused_multi_step_compiles covers the jitted path."""
    from migan_tpu.train.train_step import make_fused_train_step

    tcfg = TrainConfig(batch_size=2,
                       g_opt=OptConfig(reg_interval=4),
                       d_opt=OptConfig(reg_interval=2),
                       loss=LossConfig(r1_gamma=10.0))
    k = 3
    single = make_train_step(CFG_G, CFG_D, tcfg)
    fused = make_fused_train_step(CFG_G, CFG_D, tcfg, steps_per_call=k)

    batches = [_batch(n=2, seed=10 + i) for i in range(k)]
    rngs = jax.random.split(jax.random.PRNGKey(5), k)
    stacked = {
        "real": jnp.stack([b["real"] for b in batches]),
        "mask": jnp.stack([b["mask"] for b in batches]),
    }

    with jax.disable_jit():
        state_a = init_train_state(jax.random.PRNGKey(0), CFG_G, CFG_D,
                                   tcfg)
        state_b = jax.tree_util.tree_map(jnp.copy, state_a)
        seq_r1 = []
        for i in range(k):
            do = int(state_a.step) % 2 == 0
            seq_r1.append(do)
            state_a, _ = single(state_a, batches[i], rngs[i], do_dr1=do)
        state_b, stats = fused(state_b, stacked, rngs)

    assert int(state_b.step) == int(state_a.step) == k
    assert int(state_b.nimg) == int(state_a.nimg)
    np.testing.assert_array_equal(np.asarray(stats["Misc/r1_ran"]),
                                  np.float32(seq_r1))
    for name, a, b in (("params_G", state_a.params_G, state_b.params_G),
                       ("params_D", state_a.params_D, state_b.params_D),
                       ("ema", state_a.params_G_ema, state_b.params_G_ema),
                       ("opt_G", state_a.opt_G, state_b.opt_G),
                       ("opt_D", state_a.opt_D, state_b.opt_D)):
        for (path, x), (_, y) in zip(
                jax.tree_util.tree_leaves_with_path(a),
                jax.tree_util.tree_leaves_with_path(b)):
            np.testing.assert_allclose(
                np.asarray(y), np.asarray(x), rtol=0, atol=1e-6,
                err_msg=f"{name}{path}")
    assert stats["Loss/G/loss"].shape == (k,)


@pytest.mark.slow
def test_fused_multi_step_compiles():
    """The jitted fused program runs, advances counters, obeys the R1
    schedule across call boundaries, and donates cleanly."""
    from migan_tpu.train.train_step import make_fused_train_step

    tcfg = TrainConfig(batch_size=2,
                       g_opt=OptConfig(reg_interval=4),
                       d_opt=OptConfig(reg_interval=2),
                       loss=LossConfig(r1_gamma=10.0))
    k = 2
    state = init_train_state(jax.random.PRNGKey(0), CFG_G, CFG_D, tcfg)
    fused = make_fused_train_step(CFG_G, CFG_D, tcfg, steps_per_call=k)
    batch = {"real": jnp.stack([_batch(n=2)["real"]] * k),
             "mask": jnp.stack([_batch(n=2)["mask"]] * k)}
    rngs = jax.random.split(jax.random.PRNGKey(1), k)
    state, s1 = fused(state, batch, rngs)          # steps 0,1 -> r1 at 0
    state, s2 = fused(state, batch, rngs)          # steps 2,3 -> r1 at 2
    assert int(state.step) == 4 and int(state.nimg) == 8
    np.testing.assert_array_equal(np.asarray(s1["Misc/r1_ran"]), [1.0, 0.0])
    np.testing.assert_array_equal(np.asarray(s2["Misc/r1_ran"]), [1.0, 0.0])
    for kk in ("Loss/G/loss", "Loss/D/loss"):
        assert np.isfinite(np.asarray(s1[kk])).all(), kk
    assert s1["Loss/G/loss"].shape == (k,)  # stacked per-step stats


@pytest.mark.slow
def test_fused_multi_step_on_8_device_mesh():
    """The fused k-step program under DP: stacked batch sharded on dim 1
    (shard_batch_stacked), params replicated, state donated."""
    from migan_tpu.parallel.mesh import shard_batch_stacked
    from migan_tpu.train.train_step import make_fused_train_step

    assert len(jax.devices()) == 8
    mesh = make_mesh()
    tcfg = TrainConfig(batch_size=8,
                       d_opt=OptConfig(reg_interval=2),
                       loss=LossConfig(r1_gamma=10.0))
    k = 2
    state = replicate(init_train_state(jax.random.PRNGKey(0), CFG_G, CFG_D,
                                       tcfg), mesh)
    fused = make_fused_train_step(CFG_G, CFG_D, tcfg, steps_per_call=k)
    stacked = shard_batch_stacked({
        "real": np.stack([np.asarray(_batch(seed=i)["real"])
                          for i in range(k)]),
        "mask": np.stack([np.asarray(_batch(seed=i)["mask"])
                          for i in range(k)]),
    }, mesh)
    rngs = jax.random.split(jax.random.PRNGKey(1), k)
    state, stats = fused(state, stacked, rngs)
    assert int(state.step) == k
    assert np.isfinite(np.asarray(stats["Loss/G/loss"])).all()
    w = state.params_G["encoder"]["b16"]["conv1"]["conv1"]["w_stack"]
    assert w.sharding.is_fully_replicated


def test_uint8_wire_format_matches_float():
    """train.wire_format='u8' (host encode in train/loop.py::_encode_wire,
    on-device decode in train_step._decode_batch) must equal the float
    pipeline fed the SAME quantized values — the wire format is a
    transport codec, not a numerics change, once inputs sit on the
    1/127.5 grid."""
    from migan_tpu.train.loop import _encode_wire

    state = init_train_state(jax.random.PRNGKey(0), CFG_G, CFG_D, TCFG)
    step = make_train_step(CFG_G, CFG_D, TCFG)

    rng = np.random.RandomState(3)
    real = rng.rand(8, 16, 16, 3).astype(np.float32) * 2 - 1
    mask = (rng.rand(8, 16, 16, 1) > 0.4).astype(np.float32)
    real_u8, mask_u8 = _encode_wire(real, mask, "u8")
    assert real_u8.dtype == np.uint8 and mask_u8.dtype == np.uint8
    # the float batch the u8 wire represents
    real_q = real_u8.astype(np.float32) / 127.5 - 1.0

    k = jax.random.PRNGKey(9)
    s_u8, st_u8 = step(state, {"real": jnp.asarray(real_u8),
                               "mask": jnp.asarray(mask_u8)}, k, do_dr1=True)
    s_f, st_f = step(state, {"real": jnp.asarray(real_q),
                             "mask": jnp.asarray(mask)}, k, do_dr1=True)
    # XLA may lower /127.5 differently from numpy (reciprocal multiply):
    # agreement is to float ulps, not bitwise — bound the L2 drift tightly
    n_g = sum(np.asarray(l).size for l in
              jax.tree_util.tree_leaves(s_f.params_G))
    assert _tree_l2_diff(s_u8.params_G, s_f.params_G) < 1e-8 * n_g
    n_d = sum(np.asarray(l).size for l in
              jax.tree_util.tree_leaves(s_f.params_D))
    assert _tree_l2_diff(s_u8.params_D, s_f.params_D) < 1e-8 * n_d
    np.testing.assert_allclose(float(st_u8["Loss/G/loss"]),
                               float(st_f["Loss/G/loss"]), rtol=1e-5)

    # quantization is faithful: within half a grid step of the original
    assert np.abs(real_q - np.clip(real, -1, 1)).max() <= (1 / 127.5) * 0.51
