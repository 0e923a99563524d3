"""Model registry: construct (init, apply, cfg) handles from config dicts.

Re-implements the capability of the reference registry
(reference: lib/model_zoo/common/get_model.py:56-103): `get_model()(cfg)`
builds any registered network from a config dict, with optional pretrained
weights load and a param-count log. Functional twist: instead of an
nn.Module, you get a ModelHandle with `init(key) -> params` and
`apply(params, *args, **kw)`.
"""

from __future__ import annotations


from dataclasses import dataclass
from typing import Any, Callable, Dict

import numpy as np

_MODELS: Dict[str, Callable] = {}


def register(name: str, version: str = "1"):
    def deco(fn):
        _MODELS[name] = fn
        return fn
    return deco


@dataclass
class ModelHandle:
    cfg: Any
    init: Callable            # init(key) -> params
    apply: Callable           # apply(params, *args, **kw)
    name: str = ""


class get_model:
    """get_model()(cfg) like the reference (get_model.py:56-96)."""

    def __call__(self, cfg: Dict[str, Any]) -> ModelHandle:
        builder = _MODELS[cfg["type"]]
        handle = builder(cfg.get("args") or {})
        handle.name = cfg.get("name", cfg["type"])
        pretrained = cfg.get("pretrained")
        if pretrained:
            params = _load_pretrained(pretrained)
            init = handle.init
            handle.init = lambda key: params  # noqa: E731
            handle._random_init = init
        return handle


def _load_pretrained(path: str):
    if path.endswith(".npz"):
        from ..io.checkpoint import load_npz

        return load_npz(path)
    from ..io import load_torch_state_dict, import_migan_train

    return import_migan_train(load_torch_state_dict(path))


def _migan_cfg(args: Dict[str, Any], extra: Dict[str, Any] | None = None):
    from .migan import MiganConfig

    allowed = {f for f in MiganConfig.__dataclass_fields__}
    kw = {k: v for k, v in args.items() if k in allowed}
    if "resample_filter" in kw:
        kw["resample_filter"] = tuple(kw["resample_filter"])
    kw.setdefault("depthwise", False)
    kw.setdefault("reparametrize", False)
    if extra:
        kw.update(extra)
    return MiganConfig(**kw)


@register("migan_encoder")
def _build_migan_encoder(args):
    from . import migan

    cfg = _migan_cfg(args)
    return ModelHandle(cfg, lambda key: migan.encoder_init(key, cfg),
                       lambda p, x: migan.encoder_apply(p, cfg, x))


@register("migan_synthesis")
def _build_migan_synthesis(args):
    from . import migan

    cfg = _migan_cfg(args)
    return ModelHandle(cfg, lambda key: migan.synthesis_init(key, cfg),
                       lambda p, x, feats, **kw: migan.synthesis_apply(
                           p, cfg, x, feats, **kw))


@register("migan_generator")
def _build_migan_generator(args):
    """Generator cfg merges encoder args (ic_n) + synthesis args
    (reference migan.py:527-544 composes the two sub-configs)."""
    from . import migan

    enc_args = args["encoder"]["args"]
    syn_args = args["synthesis"]["args"]
    cfg = _migan_cfg({**syn_args, "ic_n": enc_args.get("ic_n", 4)})
    return ModelHandle(
        cfg, lambda key: migan.generator_init(key, cfg),
        lambda p, x, **kw: migan.generator_apply(p, x, cfg, **kw))


@register("migan_discriminator")
def _build_migan_discriminator(args):
    from . import migan

    cfg = _migan_cfg(args)
    return ModelHandle(cfg,
                       lambda key: migan.discriminator_init(key, cfg),
                       lambda p, x: migan.discriminator_apply(p, x, cfg))


def _comodgan_cfg(args: Dict[str, Any]):
    from .comodgan import CoModGANConfig

    allowed = {f for f in CoModGANConfig.__dataclass_fields__}
    kw = {k: v for k, v in args.items() if k in allowed}
    if "resample_filter" in kw:
        kw["resample_filter"] = tuple(kw["resample_filter"])
    if "oc_n" in args:  # encoder naming for w0_dim
        kw["w0_dim"] = args["oc_n"]
    return CoModGANConfig(**kw)


@register("comodgan_generator")
def _build_comodgan_generator(args):
    from . import comodgan

    syn_args = dict(args["synthesis"]["args"])
    enc_args = args["encoder"]["args"]
    merged = {**syn_args, "ic_n": enc_args.get("ic_n", 4),
              "oc_n": enc_args.get("oc_n", 1024),
              "use_dropout": enc_args.get("use_dropout", True),
              # NOTE: encoder/synthesis may carry different ch banks in the
              # YAML; the encoder's is authoritative for its own blocks.
              "ch_base": enc_args.get("ch_base", 32768)}
    cfg = _comodgan_cfg(merged)
    return ModelHandle(
        cfg, lambda key: comodgan.generator_init(key, cfg),
        lambda p, x, **kw: comodgan.generator_apply(p, x, cfg, **kw))


@register("comodgan_discriminator")
@register("stylegan2_discriminator")
def _build_sg_discriminator(args):
    from .stylegan import StyleGANConfig, discriminator_init, \
        discriminator_apply

    allowed = {f for f in StyleGANConfig.__dataclass_fields__}
    kw = {k: v for k, v in args.items() if k in allowed}
    if "resample_filter" in kw:
        kw["resample_filter"] = tuple(kw["resample_filter"])
    cfg = StyleGANConfig(**kw)
    return ModelHandle(cfg, lambda key: discriminator_init(key, cfg),
                       lambda p, x: discriminator_apply(p, x, cfg))


@register("comodgan_mapping")
@register("stylegan2_mapping")
def _build_mapping(args):
    from .stylegan import MappingConfig, mapping_init, mapping_apply

    allowed = {f for f in MappingConfig.__dataclass_fields__}
    kw = {k: v for k, v in args.items() if k in allowed}
    cfg = MappingConfig(**kw)
    return ModelHandle(cfg, lambda key: mapping_init(key, cfg),
                       lambda p, z, **kw2: mapping_apply(p, z, cfg, **kw2))


def count_params(params) -> int:
    import jax

    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(params))
