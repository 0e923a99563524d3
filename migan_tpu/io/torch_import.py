"""Import published PyTorch MI-GAN weights (.pt state_dicts) into our pytrees.

Layout conversions:
  - conv weights: torch OIHW -> HWIO (transpose 2,3,1,0); depthwise
    [C,1,k,k] -> [k,k,1,C].
  - buffers belonging to the fixed resampling machinery
    (``*.filter.weight``, ``*.filter_const``) are *dropped*: in this framework
    resampling is computed (ops.upfirdn2d), not baked into conv weights
    (reference: lib/model_zoo/migan_inference.py:58-103).

The key map follows the reference module tree
(reference: lib/model_zoo/migan_inference.py:203-369) so published
migan_256.pt / migan_512.pt checkpoints import without edits.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np
import jax.numpy as jnp


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pt state_dict into plain numpy arrays (torch CPU required)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _oihw_to_hwio(w: np.ndarray) -> jnp.ndarray:
    assert w.ndim == 4
    return jnp.asarray(np.transpose(w, (2, 3, 1, 0)))


def _set(tree: Dict[str, Any], path, value) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def import_migan_inference(
    state_dict: Mapping[str, np.ndarray],
) -> Dict[str, Any]:
    """Convert a reference `migan_inference.Generator` state_dict to params.

    Returns the pytree consumed by
    :func:`migan_tpu.models.migan_inference.generator_apply`.
    """
    params: Dict[str, Any] = {}
    for key, val in state_dict.items():
        parts = key.split(".")
        leaf = parts[-1]
        # Fixed resampling machinery -> computed in ops, skip.
        if "filter" in parts or leaf == "filter_const":
            continue
        if leaf == "weight" and parts[-2] in ("conv1", "conv2", "fromrgb",
                                              "torgb"):
            _set(params, parts[:-1] + ["weight"], _oihw_to_hwio(val))
        elif leaf == "bias":
            _set(params, parts[:-1] + ["bias"], jnp.asarray(val))
        elif leaf == "noise_const":
            _set(params, parts, jnp.asarray(val))
        elif leaf == "noise_strength":
            _set(params, parts, jnp.asarray(val))
        else:
            raise ValueError(f"unrecognized checkpoint key: {key}")

    # The reference attaches noise buffers to the SeparableConv2d module
    # (…conv1.noise_const); our pytree does the same, so no re-rooting needed.
    return params


def export_migan_inference(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of :func:`import_migan_inference`: our inference pytree ->
    the learnable subset of a reference `migan_inference.Generator`
    state_dict in torch layouts (conv weights HWIO -> OIHW).

    The reference module additionally registers fixed resampling buffers
    (``*.filter.weight`` / ``*.filter_const``, reference
    lib/model_zoo/migan_inference.py:58-103) that this framework computes in
    ops; to build a loadable .pt, merge this dict over a freshly constructed
    reference model's own state_dict (which carries those constants)."""
    out: Dict[str, np.ndarray] = {}

    def walk(tree, prefix=""):
        for k, v in tree.items():
            key = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, key)
            elif k == "weight":
                out[key] = np.transpose(np.asarray(v), (3, 2, 0, 1))
            else:  # bias / noise_const / noise_strength
                out[key] = np.asarray(v)

    walk(params)
    return out


def import_migan_train(
    state_dict: Mapping[str, np.ndarray],
) -> Dict[str, Any]:
    """Convert a reference training-net state_dict (G encoder+synthesis or D)
    to our pytree.

    Handles the reference's per-tensor re-parameterization weights
    ``w0 .. wN-1`` (reference: lib/model_zoo/migan.py:86-92) by stacking them
    into our single ``w_stack`` array [N, kh, kw, I/g, O], and drops
    ``resample_filter`` buffers (computed in ops here).
    """
    import re

    reparam: Dict[str, list] = {}
    params: Dict[str, Any] = {}
    for key, val in state_dict.items():
        parts = key.split(".")
        leaf = parts[-1]
        if leaf == "resample_filter":
            continue
        m = re.fullmatch(r"w(\d+)", leaf)
        if m is not None:
            reparam.setdefault(".".join(parts[:-1]), []).append(
                (int(m.group(1)), val))
            continue
        if leaf == "weight":
            if val.ndim == 4:
                _set(params, parts, _oihw_to_hwio(val))
            else:  # Dense [out, in]
                _set(params, parts, jnp.asarray(val))
        elif leaf == "const":
            # StyleGAN b4 const input: torch [C, res, res] -> NHWC [res,res,C]
            _set(params, parts, jnp.asarray(val.transpose(1, 2, 0)))
        elif leaf in ("bias", "noise_const", "noise_strength", "w_avg"):
            _set(params, parts, jnp.asarray(val))
        else:
            raise ValueError(f"unrecognized checkpoint key: {key}")

    for prefix, tensors in reparam.items():
        tensors.sort(key=lambda t: t[0])
        stack = np.stack([np.transpose(v, (2, 3, 1, 0)) for _, v in tensors])
        _set(params, prefix.split(".") + ["w_stack"], jnp.asarray(stack))
    return params


def export_migan_train(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of :func:`import_migan_train` (minus dropped buffers):
    our pytree -> reference-style flat state_dict in torch layouts."""
    flat: Dict[str, np.ndarray] = {}

    def walk(tree, prefix=""):
        for k, v in tree.items():
            key = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, key)
            else:
                flat[key] = np.asarray(v)

    walk(params)
    out: Dict[str, np.ndarray] = {}
    for key, v in flat.items():
        if key.endswith("w_stack"):
            base = key[: -len("w_stack")]
            for i in range(v.shape[0]):
                out[f"{base}w{i}"] = np.transpose(v[i], (3, 2, 0, 1))
        elif key.endswith("weight") and v.ndim == 4:
            out[key] = np.transpose(v, (3, 2, 0, 1))
        else:
            out[key] = v
    return out
