"""Re-parameterization fold: training generator -> lean inference generator.

Re-implements reference scripts/export_inference_model.py:17-85:
  w_folded = (sum_i w_i / sqrt(N)) * rsqrt(sum(w^2) + 1e-8)
i.e. the re-param sum and the forward-time weight normalization become a
static weight. Noise buffers move from the training SeparableConv2d's
pointwise conv (…conv1.conv2.noise_const) to the inference SeparableConv2d
level (…conv1.noise_const), exactly like the reference copy
(export_inference_model.py:71-73,81-83).

Only the depthwise (SeparableConv2d) training variant folds into the
inference topology — same restriction as the reference.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from ..models.migan import MiganConfig, effective_weight

Params = Dict[str, Any]


def _fold_conv(p: Params) -> Params:
    out: Params = {"weight": effective_weight(p)}
    if "bias" in p:
        out["bias"] = jnp.asarray(p["bias"], jnp.float32)
    return out


def _fold_sep(p: Params) -> Params:
    """Training SeparableConv2d -> inference SeparableConv2d params."""
    out: Params = {
        "conv1": _fold_conv(p["conv1"]),
        "conv2": {"weight": effective_weight(p["conv2"])},
    }
    if "noise_const" in p["conv2"]:
        out["noise_const"] = jnp.asarray(p["conv2"]["noise_const"])
        out["noise_strength"] = jnp.asarray(p["conv2"]["noise_strength"])
    return out


def fold_generator(train_params: Params, cfg: MiganConfig) -> Params:
    """Training G params (depthwise variant) -> inference G params.

    The result is consumed by models.migan_inference.generator_apply with
    GeneratorConfig(resolution=cfg.resolution).
    """
    assert cfg.depthwise, "only the depthwise student topology folds " \
                          "into the inference net (same as the reference)"
    enc_in: Params = {}
    for name, block in train_params["encoder"].items():
        out: Params = {
            "conv1": _fold_sep(block["conv1"]),
            "conv2": _fold_sep(block["conv2"]),
        }
        if "fromrgb" in block:
            out["fromrgb"] = _fold_conv(block["fromrgb"])
        enc_in[name] = out

    syn_in: Params = {}
    for name, block in train_params["synthesis"].items():
        syn_in[name] = {
            "conv1": _fold_sep(block["conv1"]),
            "conv2": _fold_sep(block["conv2"]),
            "torgb": _fold_conv(block["torgb"]),
        }
    return {"encoder": enc_in, "synthesis": syn_in}


def fold_diff_statistic(train_params: Params, cfg: MiganConfig,
                        x: jnp.ndarray) -> float:
    """% of output pixels where train-G(noise_mode='const') and the folded
    inference-G disagree beyond rtol=1e-3
    (reference export_inference_model.py:132-164)."""
    import numpy as np
    from ..models import migan, migan_inference

    want = migan.generator_apply(train_params, x, cfg, noise_mode="const")
    folded = fold_generator(train_params, cfg)
    icfg = migan_inference.GeneratorConfig(resolution=cfg.resolution)
    got = migan_inference.generator_apply(folded, x, icfg)
    a, b = np.asarray(want), np.asarray(got)
    not_close = ~np.isclose(a, b, rtol=1e-3)
    return float(not_close.sum() / x.shape[0] / (cfg.resolution ** 2) * 100)
