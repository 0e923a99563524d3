"""Jitted GAN training steps + optimizer/EMA machinery.

TPU-native replacement for the reference's phase loop
(reference: lib/experiments/migan_default.py:177-225,334-358,408-424):

  - One jitted step function per phase combination, selected by *static*
    booleans (do_dr1) — the reference's interval-gated phase list becomes a
    cyclic schedule over a handful of compiled programs; no recompilation.
  - Lazy-regularization optimizer adjustment: lr *= r/(r+1),
    beta **= r/(r+1) (reference migan_default.py:344-348), expressed once at
    optimizer construction (optax.adam).
  - Gradient sanitization nan_to_num(nan=0, ±1e5)
    (reference migan_default.py:219-221 / torch_utils/misc.py:46-56).
  - noise_const buffers are *frozen* (they are non-trainable registered
    buffers in the reference) via a gradient mask.
  - EMA: p_ema = lerp(p, p_ema, beta), beta = 0.5 ** (batch / ema_nimg)
    with optional ramp-up (reference migan_default.py:413-420).

Data parallelism: these steps are pure; shard the batch over a
jax.sharding.Mesh 'data' axis and replicate params (see parallel/mesh.py) —
XLA inserts the gradient all-reduce, replacing DDP autograd hooks
(SURVEY.md §2.9).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import migan
from . import loss as losses


@dataclass(frozen=True)
class OptConfig:
    """reference configs/experiment/*.yaml g_opt_kwargs/d_opt_kwargs."""

    lr: float = 1e-3
    beta1: float = 0.0
    beta2: float = 0.99
    eps: float = 1e-8
    reg_interval: Optional[int] = None  # lazy regularization interval


@dataclass(frozen=True)
class TrainConfig:
    g_opt: OptConfig = OptConfig(reg_interval=4)
    d_opt: OptConfig = OptConfig(reg_interval=16)
    loss: losses.LossConfig = losses.LossConfig()
    batch_size: int = 32           # global batch
    ema_kimg: float = 20.0
    ema_rampup: Optional[float] = None
    # Split each phase's batch into this many sequential micro-batch rounds
    # with one optimizer step (reference ddp_sync grad accumulation,
    # migan_default.py:211-214) — trades step latency for peak memory, so
    # the global batch is no longer capped by device HBM.
    grad_accum_rounds: int = 1


def make_optimizer(opt: OptConfig) -> optax.GradientTransformation:
    """Adam with the lazy-regularization mb_ratio adjustment baked in."""
    lr, b1, b2 = opt.lr, opt.beta1, opt.beta2
    if opt.reg_interval is not None:
        mb_ratio = opt.reg_interval / (opt.reg_interval + 1)
        lr = lr * mb_ratio
        b1 = b1 ** mb_ratio
        b2 = b2 ** mb_ratio
    return optax.adam(learning_rate=lr, b1=b1, b2=b2, eps=opt.eps)


def _accum_grads(loss_fn, params, batch_arrays, rounds, rng=None):
    """Mean gradients/stats of a phase loss over `rounds` micro-batches
    with bounded memory: a lax.scan carries the gradient sum, so only one
    micro-batch's activations are live at a time (the XLA analog of the
    reference's no_sync accumulation loop, migan_default.py:211-214 /
    torch_utils/misc.py:166-173 — summed torch grads and our mean differ
    by a constant factor Adam is invariant to).

    loss_fn(params, *chunk_arrays[, rng_chunk]) -> (loss, stats_dict).
    batch_arrays: [N, ...] arrays split along dim 0 (N % rounds == 0).
    """
    if rounds <= 1:
        args = batch_arrays + ((rng,) if rng is not None else ())
        (_, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, *args)
        return grads, stats

    def rs(x):
        assert x.shape[0] % rounds == 0, (x.shape, rounds)
        return x.reshape((rounds, x.shape[0] // rounds) + x.shape[1:])

    xs = tuple(rs(x) for x in batch_arrays)
    if rng is not None:
        xs = xs + (jax.random.split(rng, rounds),)

    def body(gsum, xr):
        (_, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, *xr)
        return jax.tree_util.tree_map(jnp.add, gsum, grads), stats

    init = jax.tree_util.tree_map(jnp.zeros_like, params)
    gsum, stats = jax.lax.scan(body, init, xs)
    grads = jax.tree_util.tree_map(lambda g: g / rounds, gsum)
    return grads, {k: jnp.mean(v, axis=0) for k, v in stats.items()}


def _sanitize_grads(grads):
    """reference torch_utils/misc.py:46-56 applied to every grad."""
    return jax.tree_util.tree_map(
        lambda g: jnp.nan_to_num(g, nan=0.0, posinf=1e5, neginf=-1e5), grads)


def _freeze_buffers(grads):
    """Zero grads of non-trainable buffers (noise_const)."""
    def walk(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            elif k == "noise_const":
                out[k] = jnp.zeros_like(v)
            else:
                out[k] = v
        return out

    return walk(grads)


@dataclass
class TrainState:
    """The full training state pytree (checkpointed by orbax — richer than
    the reference pkl, which drops optimizer moments, SURVEY.md §5.4)."""

    params_G: Dict[str, Any]
    params_D: Dict[str, Any]
    params_G_ema: Dict[str, Any]
    opt_G: Any
    opt_D: Any
    step: jnp.ndarray  # int32 scalar
    nimg: jnp.ndarray  # int32 scalar


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params_G, s.params_D, s.params_G_ema, s.opt_G, s.opt_D,
                s.step, s.nimg), None),
    lambda _, c: TrainState(*c),
)


def init_train_state(key, g_cfg: migan.MiganConfig, d_cfg: migan.MiganConfig,
                     cfg: TrainConfig) -> TrainState:
    kg, kd = jax.random.split(key)
    params_G = migan.generator_init(kg, g_cfg)
    params_D = migan.discriminator_init(kd, d_cfg)
    tx_g = make_optimizer(cfg.g_opt)
    tx_d = make_optimizer(cfg.d_opt)
    return TrainState(
        params_G=params_G,
        params_D=params_D,
        params_G_ema=jax.tree_util.tree_map(jnp.copy, params_G),
        opt_G=tx_g.init(params_G),
        opt_D=tx_d.init(params_D),
        step=jnp.zeros((), jnp.int32),
        nimg=jnp.zeros((), jnp.int32),
    )


def ema_update(params_G, params_G_ema, nimg, cfg: TrainConfig):
    """reference migan_default.py:413-420; buffers (noise_const) copied."""
    ema_nimg = cfg.ema_kimg * 1000.0
    if cfg.ema_rampup is not None:
        ema_nimg = jnp.minimum(ema_nimg, nimg.astype(jnp.float32)
                               * cfg.ema_rampup)
    beta = 0.5 ** (cfg.batch_size / jnp.maximum(ema_nimg, 1e-8))

    def walk(p, e):
        return p + beta * (e - p)  # p.lerp(e, beta)

    new_ema = jax.tree_util.tree_map(walk, params_G, params_G_ema)

    # buffers tracked verbatim
    def copy_buffers(tree, ema_tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = copy_buffers(v, ema_tree[k])
            elif k == "noise_const":
                out[k] = v
            else:
                out[k] = ema_tree[k]
        return out

    return copy_buffers(params_G, new_ema)


def _normalize_teacher(teacher_fn):
    """Teacher contract normalization.

    Preferred form: a ``(apply_fn, params)`` tuple with
    ``apply_fn(params, x, rng) -> (img, inter)`` — the teacher weights
    enter every jitted program as a TRACED argument. A bare closure
    ``f(x, rng)`` (unit tests, tiny teachers) is still accepted, but a
    production-size teacher must use the tuple form: closure constants
    are baked into the HLO, and the remote-compile RPC then ships them
    as program bytes — the 310 MB Co-Mod-GAN teacher exceeded the
    compile service's request-body limit outright (HTTP 413; see
    CLAUDE.md "closure-constant compile hazard")."""
    if teacher_fn is None:
        return None, None
    if isinstance(teacher_fn, tuple):
        return teacher_fn
    return (lambda tp, x, k: teacher_fn(x, k)), None


def make_train_step(g_cfg: migan.MiganConfig, d_cfg: migan.MiganConfig,
                    cfg: TrainConfig, teacher_fn=None):
    """Build train_step(state, batch, rng, *, do_dr1) -> (state, stats).

    batch: dict(real=[N,H,W,3], mask=[N,H,W,1]) NHWC, mask 1=known.

    The step is FOUR jitted programs called in sequence — Gmain, Dmain,
    Dreg (every d_reg_interval steps) and the EMA update — mirroring the
    reference's distinct phase opt.step()s
    (reference migan_default.py:200-224). Besides fidelity, per-phase
    programs keep each XLA executable's live-buffer set small (one fused
    G+D+EMA mega-program was observed to wedge the remote TPU runtime) and
    let the phases pipeline with host-side data loading.
    """
    tx_g = make_optimizer(cfg.g_opt)
    tx_d = make_optimizer(cfg.d_opt)
    rounds = max(1, cfg.grad_accum_rounds)
    t_apply, t_params = _normalize_teacher(teacher_fn)

    @jax.jit
    def g_phase(params_G, opt_G, params_D, real, mask, rng, tparams):
        tf = None if t_apply is None else (
            lambda x, k: t_apply(tparams, x, k))

        def g_loss_fn(p, x, m, k):
            return losses.g_loss(p, params_D, x, m, x * m, k,
                                 g_cfg, d_cfg, cfg.loss, tf)

        g_grads, g_stats = _accum_grads(g_loss_fn, params_G, (real, mask),
                                        rounds, rng=rng)
        g_grads = _freeze_buffers(_sanitize_grads(g_grads))
        g_updates, opt_G = tx_g.update(g_grads, opt_G, params_G)
        return optax.apply_updates(params_G, g_updates), opt_G, g_stats

    @jax.jit
    def d_phase(params_D, opt_D, params_G, real, mask, rng):
        def d_loss_fn(p, x, m, k):
            return losses.d_loss(p, params_G, x, m, x * m, k, g_cfg, d_cfg,
                                 compute_dtype=cfg.loss.compute_dtype)

        d_grads, d_stats = _accum_grads(d_loss_fn, params_D, (real, mask),
                                        rounds, rng=rng)
        d_grads = _sanitize_grads(d_grads)
        d_updates, opt_D = tx_d.update(d_grads, opt_D, params_D)
        return optax.apply_updates(params_D, d_updates), opt_D, d_stats

    @jax.jit
    def d_r1_phase(params_D, opt_D, real, mask):
        gain = cfg.d_opt.reg_interval or 1

        def d_r1_fn(p, x, m):
            r1_l, r1_stats = losses.d_r1_loss(
                p, x, m, d_cfg, cfg.loss.r1_gamma,
                compute_dtype=cfg.loss.compute_dtype)
            return r1_l * gain, r1_stats

        r1_grads, r1_stats = _accum_grads(d_r1_fn, params_D, (real, mask),
                                          rounds)
        r1_grads = _sanitize_grads(r1_grads)
        r1_updates, opt_D = tx_d.update(r1_grads, opt_D, params_D)
        return optax.apply_updates(params_D, r1_updates), opt_D, r1_stats

    @jax.jit
    def ema_phase(params_G, params_G_ema, nimg):
        return ema_update(params_G, params_G_ema, nimg, cfg)

    _decode = jax.jit(_decode_batch)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array, *, do_dr1: bool = False
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        real, mask = _decode(batch["real"], batch["mask"])
        k_g, k_d = jax.random.split(rng)
        params_G, opt_G, g_stats = g_phase(
            state.params_G, state.opt_G, state.params_D, real, mask, k_g,
            t_params)
        params_D, opt_D, d_stats = d_phase(
            state.params_D, state.opt_D, params_G, real, mask, k_d)
        if do_dr1:
            params_D, opt_D, r1_stats = d_r1_phase(params_D, opt_D, real,
                                                   mask)
            d_stats = {**d_stats, **r1_stats}
        nimg = state.nimg + real.shape[0]
        params_G_ema = ema_phase(params_G, state.params_G_ema, nimg)
        new_state = TrainState(
            params_G=params_G, params_D=params_D, params_G_ema=params_G_ema,
            opt_G=opt_G, opt_D=opt_D, step=state.step + 1, nimg=nimg)
        return new_state, {**g_stats, **d_stats}

    return train_step


def _decode_batch(real, mask):
    """On-device decode of the uint8 wire format (train.wire_format='u8',
    train/loop.py::_encode_wire): over a thin host<->device link (the
    remote-TPU tunnel; the reference's analog is shipping uint8 to the GPU
    and normalizing there, metric_utils.py-style) images travel as
    round((x+1)*127.5) uint8 and masks as 0/1 uint8 — 4x fewer wire bytes
    than the float32 contract. Float batches pass through untouched."""
    if real.dtype == jnp.uint8:
        real = real.astype(jnp.float32) / 127.5 - 1.0
    if mask.dtype == jnp.uint8:
        mask = mask.astype(jnp.float32)
    return real, mask


def make_fused_train_step(g_cfg: migan.MiganConfig, d_cfg: migan.MiganConfig,
                          cfg: TrainConfig, teacher_fn=None,
                          steps_per_call: int = 8):
    """ONE jitted program advancing `steps_per_call` full optimizer steps.

    Why this exists: it collapses the 4 per-phase dispatches per step into
    one dispatch per k steps with the state donated in place — the
    standard JAX/TPU idiom for keeping the host out of the training loop
    (multi-host pods, background data loading, dispatch-jittery links).
    Measured on the single-chip axon setup it is throughput-NEUTRAL
    (migan-256 bs=16 bf16: 160 ms/step for k in {1, 2, 4, 8} vs 158 ms for
    the per-phase path — the step is device-bound, per-dispatch overhead
    is ~1 ms, and a device trace confirms the scan body fully occupies the
    chip), so the per-phase path remains a fine default interactively.
    Semantics are IDENTICAL to k sequential make_train_step calls
    (parity-tested eagerly, where both paths run the same per-op kernels,
    in tests/test_train_step.py):

      - per-step rng: callers pass `rngs` [k] keys (one per step), split
        into (k_g, k_d) exactly like the single-step path;
      - lazy R1 (reference migan_default.py:200-224 interval phases) runs
        via lax.cond when (step0 + i) % d_reg_interval == 0, where step0
        is the state's global step at call entry — the cyclic schedule is
        now data-dependent, so ONE executable covers every phase
        combination (both branches are compiled once, only the taken one
        executes);
      - stats are stacked [k] per key; R1 keys are always present, zero on
        non-R1 steps, with "Misc/r1_ran" marking which steps ran it.

    batch: dict(real=[k, N, H, W, 3], mask=[k, N, H, W, 1]).
    Returns step_fn(state, batch, rngs) -> (state, stats); the state
    argument is donated.
    """
    tx_g = make_optimizer(cfg.g_opt)
    tx_d = make_optimizer(cfg.d_opt)
    rounds = max(1, cfg.grad_accum_rounds)
    interval = cfg.d_opt.reg_interval
    k_steps = steps_per_call
    t_apply, t_params = _normalize_teacher(teacher_fn)

    def one_step(state: TrainState, real, mask, rng, tparams):
        real, mask = _decode_batch(real, mask)
        k_g, k_d = jax.random.split(rng)
        tf = None if t_apply is None else (
            lambda x, k: t_apply(tparams, x, k))

        def g_loss_fn(p, x, m, kk):
            return losses.g_loss(p, state.params_D, x, m, x * m, kk,
                                 g_cfg, d_cfg, cfg.loss, tf)

        g_grads, g_stats = _accum_grads(g_loss_fn, state.params_G,
                                        (real, mask), rounds, rng=k_g)
        g_grads = _freeze_buffers(_sanitize_grads(g_grads))
        g_updates, opt_G = tx_g.update(g_grads, state.opt_G, state.params_G)
        params_G = optax.apply_updates(state.params_G, g_updates)

        def d_loss_fn(p, x, m, kk):
            return losses.d_loss(p, params_G, x, m, x * m, kk, g_cfg, d_cfg,
                                 compute_dtype=cfg.loss.compute_dtype)

        d_grads, d_stats = _accum_grads(d_loss_fn, state.params_D,
                                        (real, mask), rounds, rng=k_d)
        d_grads = _sanitize_grads(d_grads)
        d_updates, opt_D = tx_d.update(d_grads, state.opt_D, state.params_D)
        params_D = optax.apply_updates(state.params_D, d_updates)

        def r1_branch(operand):
            p_d, o_d = operand
            gain = interval or 1

            def d_r1_fn(p, x, m):
                r1_l, r1_stats = losses.d_r1_loss(
                    p, x, m, d_cfg, cfg.loss.r1_gamma,
                    compute_dtype=cfg.loss.compute_dtype)
                return r1_l * gain, r1_stats

            r1_grads, r1_stats = _accum_grads(d_r1_fn, p_d, (real, mask),
                                              rounds)
            r1_grads = _sanitize_grads(r1_grads)
            r1_updates, o_d = tx_d.update(r1_grads, o_d, p_d)
            return (optax.apply_updates(p_d, r1_updates), o_d, r1_stats,
                    jnp.ones((), jnp.float32))

        def no_r1_branch(operand):
            p_d, o_d = operand
            zero = jnp.zeros((), jnp.float32)
            return (p_d, o_d,
                    {"Loss/r1_penalty": zero, "Loss/D/reg": zero}, zero)

        if interval is not None:
            do = (state.step % interval) == 0
            params_D, opt_D, r1_stats, r1_ran = jax.lax.cond(
                do, r1_branch, no_r1_branch, (params_D, opt_D))
        else:
            params_D, opt_D, r1_stats, r1_ran = no_r1_branch(
                (params_D, opt_D))

        nimg = state.nimg + real.shape[0]
        params_G_ema = ema_update(params_G, state.params_G_ema, nimg, cfg)
        new_state = TrainState(
            params_G=params_G, params_D=params_D, params_G_ema=params_G_ema,
            opt_G=opt_G, opt_D=opt_D, step=state.step + 1, nimg=nimg)
        stats = {**g_stats, **d_stats, **r1_stats, "Misc/r1_ran": r1_ran}
        return new_state, stats

    def multi_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rngs: jax.Array, tparams):
        real_k, mask_k = batch["real"], batch["mask"]
        assert real_k.shape[0] == k_steps, (real_k.shape, k_steps)

        if k_steps == 1:
            # no point lowering a length-1 while loop
            new_state, stats = one_step(state, real_k[0], mask_k[0], rngs[0],
                                        tparams)
            return new_state, jax.tree_util.tree_map(
                lambda s: s[None], stats)

        def body(st, xs):
            r, m, kk = xs
            return one_step(st, r, m, kk, tparams)

        return jax.lax.scan(body, state, (real_k, mask_k, rngs))

    jitted = jax.jit(multi_step, donate_argnums=(0,))

    def step(state, batch, rngs):
        # teacher weights ride along as a traced argument (see
        # _normalize_teacher); callers keep the 3-arg signature
        return jitted(state, batch, rngs, t_params)

    return step
