"""Co-Mod-GAN (the MI-GAN distillation teacher) — functional JAX, NHWC.

Re-implements the capability of the reference
(reference: lib/model_zoo/comodgan.py): a StyleGAN2 generator co-modulated by
a global image code — the encoder produces per-resolution skip features and a
1024-d global vector w0; every synthesis layer is modulated by
w_long = concat([w, w0]) (reference comodgan.py:254,319-337).

The encoder reuses stylegan discriminator blocks (returning the conv0
feature as the skip, reference comodgan.py:31-61) and an epilogue with
dropout producing the global code (reference comodgan.py:64-111).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import setup_filter, upsample2d, get_unit
from .migan import dense_init, dense_apply, minibatch_std, KeySeq, Params
from .stylegan import (
    MappingConfig, mapping_init, mapping_apply,
    conv2d_layer_init, conv2d_layer_apply,
    synthesis_layer_init, synthesis_layer_apply,
    torgb_layer_init, torgb_layer_apply,
    discrim_block_init, discrim_block_apply,
    StyleGANConfig,
    discriminator_init as sg_discriminator_init,
    discriminator_apply as sg_discriminator_apply,
)


@dataclass(frozen=True)
class CoModGANConfig:
    """reference comodgan.py Encoder/Synthesis defaults + loss.py:68-111."""

    resolution: int = 256
    ic_n: int = 4
    rgb_n: int = 3
    z_dim: int = 512
    w_dim: int = 512
    w0_dim: int = 1024          # global co-modulation code ("oc_n")
    ch_base: int = 32768
    ch_max: int = 512
    resample_filter: Tuple[int, ...] = (1, 3, 3, 1)
    activation: str = "lrelu_agc(alpha=0.2, gain=sqrt_2, clamp=256)"
    use_dropout: bool = True
    has_extra_final_layer: bool = False
    mbstd_group_size: int = 0
    mbstd_c_n: int = 0

    @property
    def log2res(self):
        l = int(math.log2(self.resolution))
        if 2 ** l != self.resolution:
            raise ValueError(self.resolution)
        return l

    @property
    def encode_res(self):
        return [2 ** i for i in range(self.log2res, 1, -1)]

    @property
    def block_res(self):
        return [2 ** i for i in range(2, self.log2res + 1)]

    def ch(self, res):
        return min(self.ch_base // res, self.ch_max)

    @property
    def act(self):
        return get_unit(self.activation)

    @property
    def filt(self):
        return setup_filter(list(self.resample_filter))

    @property
    def num_ws(self) -> int:
        # b4: 1 conv; each up-block: 2 convs; + last torgb
        # == 14 for 256, 16 for 512 (reference comodgan.py:371-374).
        return 1 + 2 * (len(self.block_res) - 1) + 1

    @property
    def mapping_cfg(self) -> MappingConfig:
        return MappingConfig(z_dim=self.z_dim, w_dim=self.w_dim,
                             num_ws=self.num_ws, lr_multiplier=0.01,
                             w_avg_beta=0.995, activation=self.activation)


# ---------------------------------------------------------------------------
# Encoder (reference comodgan.py:114-204)
# ---------------------------------------------------------------------------

def encoder_init(key, cfg: CoModGANConfig) -> Params:
    params: Params = {}
    res_list = cfg.encode_res
    keys = jax.random.split(key, len(res_list))
    for idx, (resi, resj) in enumerate(zip(res_list[:-1], res_list[1:])):
        ci, cj = cfg.ch(resi), cfg.ch(resj)
        params[f"b{resi}"] = discrim_block_init(
            keys[idx], ci, ci, cj, rgb_n=cfg.ic_n if idx == 0 else None,
            reslink=False)
    c4 = cfg.ch(res_list[-1])
    k1, k2, k3 = jax.random.split(keys[-1], 3)
    b4: Params = {
        "conv": conv2d_layer_init(k1, c4 + cfg.mbstd_c_n, c4, 3),
        "fc": dense_init(k2, c4 * 16, cfg.w0_dim),
    }
    if cfg.has_extra_final_layer:
        b4["out"] = dense_init(k3, cfg.w0_dim, cfg.w0_dim)
    params["b4"] = b4
    return params


def encoder_apply(params: Params, img, cfg: CoModGANConfig, *,
                  dropout_rng: Optional[jax.Array] = None):
    """Returns (x_global [N, w0_dim], feats {res: NHWC}).

    dropout_rng=None -> eval mode (dropout off), matching the teacher's
    .eval() usage (reference loss.py:67,121).
    """
    act = cfg.act
    sg_cfg = StyleGANConfig(
        resolution=cfg.resolution, ch_base=cfg.ch_base, ch_max=cfg.ch_max,
        ic_n=cfg.ic_n, activation=cfg.activation,
        mbstd_group_size=cfg.mbstd_group_size, mbstd_c_n=cfg.mbstd_c_n,
        resample_filter=cfg.resample_filter)
    x = None
    feats: Dict[int, jnp.ndarray] = {}
    for resi in cfg.encode_res[:-1]:
        x, feat = discrim_block_apply(params[f"b{resi}"], x, img, sg_cfg,
                                      return_feat=True)
        img = None
        feats[resi] = feat

    p4 = params["b4"]
    if cfg.mbstd_c_n > 0:
        x = minibatch_std(x, cfg.mbstd_group_size, cfg.mbstd_c_n)
    feat = conv2d_layer_apply(p4["conv"], x, act=act)
    feats[4] = feat
    x = jnp.transpose(feat, (0, 3, 1, 2)).reshape(feat.shape[0], -1)
    x = dense_apply(p4["fc"], x, act=act)
    if "out" in p4:
        x = dense_apply(p4["out"], x)
    if cfg.use_dropout and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 0.5, x.shape)
        x = jnp.where(keep, x / 0.5, 0.0).astype(x.dtype)
    return x, feats


# ---------------------------------------------------------------------------
# Synthesis (reference comodgan.py:207-421)
# ---------------------------------------------------------------------------

def synthesis_init(key, cfg: CoModGANConfig) -> Params:
    params: Params = {}
    res_list = cfg.block_res
    keys = jax.random.split(key, len(res_list))
    c4 = cfg.ch(4)
    kf, kc, kt = jax.random.split(keys[0], 3)
    params["b4"] = {
        "fc": dense_init(kf, cfg.w0_dim, c4 * 16),
        "conv": synthesis_layer_init(kc, c4, c4, 3, cfg.w0_dim + cfg.w_dim,
                                     resolution=4),
        "torgb": torgb_layer_init(kt, c4, cfg.rgb_n, 1,
                                  cfg.w0_dim + cfg.w_dim),
    }
    for i, (resi, resj) in enumerate(zip(res_list[:-1], res_list[1:])):
        ci, cj = cfg.ch(resi), cfg.ch(resj)
        k0, k1, k2 = jax.random.split(keys[i + 1], 3)
        params[f"b{resj}"] = {
            "conv0": synthesis_layer_init(k0, ci, cj, 3,
                                          cfg.w_dim + cfg.w0_dim,
                                          resolution=resj),
            "conv1": synthesis_layer_init(k1, cj, cj, 3,
                                          cfg.w_dim + cfg.w0_dim,
                                          resolution=resj),
            "torgb": torgb_layer_init(k2, cj, cfg.rgb_n, 1,
                                      cfg.w_dim + cfg.w0_dim),
        }
    return params


def synthesis_apply(params: Params, x_global, feats, ws,
                    cfg: CoModGANConfig, *, noise_mode="random",
                    rng: Optional[jax.Array] = None,
                    return_intermediate: bool = False):
    """reference comodgan.py:398-421. ws: [N, num_ws, w_dim]."""
    act = cfg.act
    keyseq = KeySeq(rng) if noise_mode == "random" else None
    w0 = x_global
    p4 = params["b4"]

    # fc -> [N, C, 4, 4] in torch order, then to NHWC (import parity).
    x = dense_apply(p4["fc"], x_global, act=act)
    c4 = feats[4].shape[-1]
    x = x.reshape(x.shape[0], c4, 4, 4).transpose(0, 2, 3, 1)
    x = x + feats[4]

    w_idx = 0
    w_long = jnp.concatenate([ws[:, w_idx], w0], axis=1)
    x = synthesis_layer_apply(p4["conv"], x, w_long, act=act,
                              noise_mode=noise_mode, keyseq=keyseq)
    w_idx += 1
    w_long = jnp.concatenate([ws[:, w_idx], w0], axis=1)
    img = torgb_layer_apply(p4["torgb"], x, w_long)
    inter = {"res_to_rgb": {4: img}, "res_img": {4: img}}

    for res in cfg.block_res[1:]:
        p = params[f"b{res}"]
        w_long = jnp.concatenate([ws[:, w_idx], w0], axis=1)
        x = synthesis_layer_apply(p["conv0"], x, w_long, act=act, up=2,
                                  resample_filter=cfg.filt,
                                  noise_mode=noise_mode, keyseq=keyseq)
        x = x + feats[res]
        w_idx += 1
        w_long = jnp.concatenate([ws[:, w_idx], w0], axis=1)
        x = synthesis_layer_apply(p["conv1"], x, w_long, act=act,
                                  noise_mode=noise_mode, keyseq=keyseq)
        w_idx += 1
        img = upsample2d(img, cfg.filt)
        w_long = jnp.concatenate([ws[:, w_idx], w0], axis=1)
        y = torgb_layer_apply(p["torgb"], x, w_long)
        img = img + y
        inter["res_to_rgb"][res] = y
        inter["res_img"][res] = img

    if return_intermediate:
        return img, inter
    return img


# ---------------------------------------------------------------------------
# Generator / Discriminator (reference comodgan.py:424-460)
# ---------------------------------------------------------------------------

def generator_init(key, cfg: CoModGANConfig) -> Params:
    km, ke, ks = jax.random.split(key, 3)
    return {
        "mapping": mapping_init(km, cfg.mapping_cfg),
        "encoder": encoder_init(ke, cfg),
        "synthesis": synthesis_init(ks, cfg),
    }


def generator_apply(params: Params, x, cfg: CoModGANConfig, *,
                    z: Optional[jnp.ndarray] = None,
                    rng: Optional[jax.Array] = None,
                    truncation_psi: float = 1.0,
                    noise_mode: str = "random",
                    return_intermediate: bool = False):
    """x: [N,H,W,4] = concat([mask-0.5, rgb*mask]). z sampled if None."""
    if z is None:
        assert rng is not None, "need rng to sample z"
        rng, kz = jax.random.split(rng)
        z = jax.random.normal(kz, (x.shape[0], cfg.z_dim), jnp.float32)
    ws = mapping_apply(params["mapping"], z, cfg.mapping_cfg,
                       truncation_psi=truncation_psi)
    x_global, feats = encoder_apply(params["encoder"], x, cfg)
    return synthesis_apply(params["synthesis"], x_global, feats, ws, cfg,
                           noise_mode=noise_mode, rng=rng,
                           return_intermediate=return_intermediate)


def make_teacher_apply(cfg: CoModGANConfig):
    """Param-carrying teacher for train.loss.g_loss (reference
    loss.py:131-137: teacher runs with random z, eval mode, random
    noise): ``apply(params, x, rng) -> (img, inter)``. The weights stay
    a TRACED argument of whatever program embeds the teacher — a
    params-closing closure bakes ~310 MB of Co-Mod-GAN weights into the
    HLO as constants, which the remote-compile RPC rejects outright
    (HTTP 413; train_step._normalize_teacher)."""
    def teacher_apply(params: Params, x, rng):
        img, inter = generator_apply(
            params, x, cfg, rng=rng, noise_mode="random",
            return_intermediate=True)
        return jax.lax.stop_gradient(img), jax.tree_util.tree_map(
            jax.lax.stop_gradient, inter)

    return teacher_apply


def make_teacher_fn(params: Params, cfg: CoModGANConfig):
    """Closure form of make_teacher_apply — unit-test convenience only;
    production teachers must keep params as an argument (see above)."""
    apply = make_teacher_apply(cfg)

    def teacher_fn(x, rng):
        return apply(params, x, rng)

    return teacher_fn


# The Co-Mod-GAN discriminator is StyleGAN2's (reference comodgan.py:458-460).
discriminator_init = sg_discriminator_init
discriminator_apply = sg_discriminator_apply


def load_comodgan_forward(model_name: str, model_path: str,
                          dtype: str = "float32",
                          ch_base=None, ch_max=None,
                          z=None, noise_mode: str = "random"):
    """Demo-CLI loader: returns (jitted forward [N,H,W,4]->[N,H,W,3], res).

    Matches the reference demo's comodgan path (reference scripts/demo.py:
    95-110): by default z is sampled per call and noise_mode is 'random'.
    A fixed `z` ([1, z_dim], broadcast over the batch) plus
    noise_mode='const' makes the run deterministic and cross-framework
    comparable (the reference Generator.forward accepts z the same way,
    reference comodgan.py:438-445). ch_base/ch_max override the channel
    banks (reference comodgan.py Encoder/Synthesis kwargs) for
    reduced-width checkpoints.
    """
    import jax.numpy as jnp

    resolution = int(model_name.split("-")[1])
    kw = {}
    if ch_base is not None:
        kw["ch_base"] = ch_base
    if ch_max is not None:
        kw["ch_max"] = ch_max
    cfg = CoModGANConfig(resolution=resolution, **kw)
    if model_path.endswith(".npz"):
        from ..io.checkpoint import load_npz

        params = load_npz(model_path)
    else:
        from ..io import load_torch_state_dict, import_migan_train

        params = import_migan_train(load_torch_state_dict(model_path))

    key_holder = {"key": jax.random.PRNGKey(0)}
    z_fixed = None if z is None else jnp.asarray(z, jnp.float32)

    @jax.jit
    def _fwd(params, x, rng):
        zz = None
        if z_fixed is not None:
            zz = jnp.broadcast_to(z_fixed, (x.shape[0], z_fixed.shape[-1]))
        y = generator_apply(params, x.astype(dtype), cfg, z=zz, rng=rng,
                            noise_mode=noise_mode)
        return y.astype(jnp.float32)

    def forward(x):
        key_holder["key"], k = jax.random.split(key_holder["key"])
        return _fwd(params, x, k)

    return forward, resolution
