"""MI-GAN training losses — pure functions of param pytrees.

Re-implements the capability of the reference MIGANLoss
(reference: lib/experiments/loss.py:24-234) as jax.grad-able loss functions:

  - Gmain: non-saturating GAN loss softplus(-D(composite)) on the
    mask-composited generator output (+ optional multi-resolution image-level
    knowledge distillation from a Co-Mod-GAN teacher).
  - Dmain: softplus(+fake_logits) + softplus(-real_logits).
  - Dr1: R1 gradient penalty via jax.grad-through-jax.grad (the reference
    needs conv2d_gradfix + autograd.grad(create_graph=True); XLA convs are
    C-infinity differentiable so this is just nested grad).

All tensors NHWC. The mask convention is 1=known, 0=hole; the D input is
concat([mask - 0.5, image]) (reference loss.py:161-164).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import migan


@dataclass(frozen=True)
class KDConfig:
    """Image-level knowledge distillation (reference loss.py:171-186,
    config: configs/experiment/migan_places512.yaml image_level_kd_kwargs)."""

    start_resolution: int = 32
    weight: float = 2.0


@dataclass(frozen=True)
class LossConfig:
    r1_gamma: float = 10.0
    kd: Optional[KDConfig] = None
    # Mixed-precision policy: run the G/D forward+backward in this dtype
    # ("bfloat16" on TPU) while params/optimizer stay f32 master weights —
    # the model casts weights to the activation dtype at each layer
    # (models/migan.py conv_layer_apply), so casting the loss INPUTS is the
    # whole policy. Loss math on logits always runs f32. None = f32
    # (numerically the reference's full-precision training).
    compute_dtype: Optional[str] = None


def _cast(compute_dtype, *xs):
    if compute_dtype is None:
        return xs
    dt = jnp.dtype(compute_dtype)
    return tuple(x.astype(dt) for x in xs)


TeacherFn = Callable[[jnp.ndarray, jax.Array], Tuple[jnp.ndarray, Dict]]
# teacher(x, rng) -> (img, {"res_to_rgb": {res: tensor}})


def _nearest_resize_mask(mask: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """F.interpolate(mode='nearest') equivalent for NHWC masks."""
    return jax.image.resize(mask, (mask.shape[0], h, w, mask.shape[3]),
                            method="nearest")


def g_loss(
    params_G: Dict,
    params_D: Dict,
    real: jnp.ndarray,
    mask: jnp.ndarray,
    erased: jnp.ndarray,
    rng: jax.Array,
    g_cfg: migan.MiganConfig,
    d_cfg: migan.MiganConfig,
    loss_cfg: LossConfig,
    teacher_fn: Optional[TeacherFn] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Gmain (reference loss.py:159-190). Returns (scalar loss, stats)."""
    real, mask, erased = _cast(loss_cfg.compute_dtype, real, mask, erased)
    gen_x = jnp.concatenate([mask - 0.5, erased], axis=-1)
    k_noise, k_teacher = jax.random.split(rng)
    gen_img, inter = migan.generator_apply(
        params_G, gen_x, g_cfg, noise_mode="random", rng=k_noise,
        return_intermediate=True)
    combined = gen_img * (1 - mask) + real * mask
    gen_logits = migan.discriminator_apply(
        params_D, jnp.concatenate([mask - 0.5, combined], axis=-1),
        d_cfg).astype(jnp.float32)
    loss_gan = jnp.mean(jax.nn.softplus(-gen_logits))

    stats = {
        "Loss/scores/fake": jnp.mean(gen_logits),
        "Loss/signs/fake": jnp.mean(jnp.sign(gen_logits)),
    }

    loss = loss_gan
    if teacher_fn is not None and loss_cfg.kd is not None:
        t_img, t_inter = teacher_fn(gen_x, k_teacher)
        kd_loss = 0.0
        for res, t_rgb in t_inter["res_to_rgb"].items():
            if res < loss_cfg.kd.start_resolution:
                continue
            g_rgb = inter["res_to_rgb"][res]
            m = _nearest_resize_mask(mask, g_rgb.shape[1], g_rgb.shape[2])
            kd_loss = kd_loss + jnp.mean(
                jnp.abs(g_rgb - jax.lax.stop_gradient(t_rgb)) * (1 - m))
        loss = loss + loss_cfg.kd.weight * kd_loss
        stats["Loss/G/kd_l1_image_level_loss"] = kd_loss
    stats["Loss/G/loss"] = loss
    return loss, stats


def d_loss(
    params_D: Dict,
    params_G: Dict,
    real: jnp.ndarray,
    mask: jnp.ndarray,
    erased: jnp.ndarray,
    rng: jax.Array,
    g_cfg: migan.MiganConfig,
    d_cfg: migan.MiganConfig,
    compute_dtype: Optional[str] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Dmain: fake + real terms (reference loss.py:192-221)."""
    real, mask, erased = _cast(compute_dtype, real, mask, erased)
    gen_x = jnp.concatenate([mask - 0.5, erased], axis=-1)
    gen_img = migan.generator_apply(
        jax.lax.stop_gradient(params_G), gen_x, g_cfg, noise_mode="random",
        rng=rng)
    combined = gen_img * (1 - mask) + real * mask
    fake_logits = migan.discriminator_apply(
        params_D, jnp.concatenate([mask - 0.5, combined], axis=-1),
        d_cfg).astype(jnp.float32)
    loss_fake = jnp.mean(jax.nn.softplus(fake_logits))

    real_x = jnp.concatenate([mask - 0.5, real], axis=-1)
    real_logits = migan.discriminator_apply(params_D, real_x,
                                            d_cfg).astype(jnp.float32)
    loss_real = jnp.mean(jax.nn.softplus(-real_logits))

    stats = {
        "Loss/scores/fake": jnp.mean(fake_logits),
        "Loss/signs/fake": jnp.mean(jnp.sign(fake_logits)),
        "Loss/scores/real": jnp.mean(real_logits),
        "Loss/signs/real": jnp.mean(jnp.sign(real_logits)),
        "Loss/D/loss": jnp.mean(jax.nn.softplus(fake_logits))
        + jnp.mean(jax.nn.softplus(-real_logits)),
    }
    return loss_fake + loss_real, stats


def d_r1_loss(
    params_D: Dict,
    real: jnp.ndarray,
    mask: jnp.ndarray,
    d_cfg: migan.MiganConfig,
    r1_gamma: float,
    compute_dtype: Optional[str] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Dr1 gradient penalty (reference loss.py:223-231).

    grad is taken w.r.t. the D *input*; the outer jax.grad over params_D
    differentiates through this inner grad (double backward).
    """
    real, mask = _cast(compute_dtype, real, mask)
    real_x = jnp.concatenate([mask - 0.5, real], axis=-1)

    def d_sum(x):
        return jnp.sum(migan.discriminator_apply(params_D, x,
                                                 d_cfg).astype(jnp.float32))

    r1_grads = jax.grad(d_sum)(real_x).astype(jnp.float32)
    r1_penalty = jnp.sum(jnp.square(r1_grads), axis=(1, 2, 3))
    loss = jnp.mean(r1_penalty) * (r1_gamma / 2.0)
    stats = {
        "Loss/r1_penalty": jnp.mean(r1_penalty),
        "Loss/D/reg": loss,
    }
    return loss, stats
