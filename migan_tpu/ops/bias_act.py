"""Fused bias + activation + gain + clamp.

TPU-native equivalent of the reference CUDA bias_act kernel
(reference: torch_utils/ops/bias_act.cu, wrapper bias_act.py:55-210) and of the
eager `lrelu_agc` unit that the MI-GAN models actually call
(reference: lib/model_zoo/common/utils.py:96-125).

On TPU there is nothing to hand-fuse: ``clamp(gain * act(x + b), ±c)`` is a
chain of element-wise ops that XLA fuses into the producing convolution's
epilogue for free, and `jax.grad` provides arbitrary-order gradients (the
reference needed analytic 1st/2nd-order CUDA gradient modes for R1).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp

_SQRT2 = math.sqrt(2.0)


@dataclass(frozen=True)
class ActivationSpec:
    fn: Callable[[jnp.ndarray, float], jnp.ndarray]  # (x, alpha) -> y
    def_alpha: float = 0.0
    def_gain: float = 1.0


# Registry matching reference bias_act.py:23-33 (9 activations).
activation_funcs = {
    "linear": ActivationSpec(lambda x, a: x, 0.0, 1.0),
    "relu": ActivationSpec(lambda x, a: jnp.maximum(x, 0.0), 0.0, _SQRT2),
    "lrelu": ActivationSpec(
        lambda x, a: jnp.where(x >= 0, x, x * a), 0.2, _SQRT2
    ),
    "tanh": ActivationSpec(lambda x, a: jnp.tanh(x), 0.0, 1.0),
    "sigmoid": ActivationSpec(lambda x, a: jax.nn.sigmoid(x), 0.0, 1.0),
    "elu": ActivationSpec(lambda x, a: jax.nn.elu(x), 0.0, 1.0),
    "selu": ActivationSpec(lambda x, a: jax.nn.selu(x), 0.0, 1.0),
    "softplus": ActivationSpec(lambda x, a: jax.nn.softplus(x), 0.0, 1.0),
    "swish": ActivationSpec(lambda x, a: jax.nn.silu(x), 0.0, _SQRT2),
}


def bias_act(
    x: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    dim: int = -1,
    act: str = "linear",
    alpha: Optional[float] = None,
    gain: Optional[float] = None,
    clamp: Optional[float] = None,
) -> jnp.ndarray:
    """``clamp(gain * act(x + b), -clamp, clamp)``.

    Args:
        x: input of any shape.
        b: optional bias broadcast along dimension ``dim`` (default: channel
           dim = last, NHWC convention; the reference NCHW default is dim=1).
        act: name in :data:`activation_funcs`.
        alpha: activation shape parameter (lrelu slope); None = act default.
        gain: magnitude scale; None = act default.
        clamp: clamp to ±clamp if >= 0 / not None.
    """
    spec = activation_funcs[act]
    alpha = float(spec.def_alpha if alpha is None else alpha)
    gain = float(spec.def_gain if gain is None else gain)
    clamp = float(clamp) if clamp is not None else -1.0

    if b is not None:
        assert b.ndim == 1
        shape = [1] * x.ndim
        shape[dim] = b.shape[0]
        x = x + b.reshape(shape).astype(x.dtype)

    x = spec.fn(x, alpha)
    if gain != 1.0:
        x = x * jnp.asarray(gain, dtype=x.dtype)
    if clamp >= 0.0:
        x = jnp.clip(x, -clamp, clamp)
    return x


@dataclass(frozen=True)
class lrelu_agc:
    """Leaky-ReLU with alpha, gain and clamp — callable with a runtime ``gain``.

    Semantics match reference lib/model_zoo/common/utils.py:96-125:
    ``y = clip(lrelu(x, alpha) * (self.gain * gain), ±(clamp * gain))``.
    The runtime ``gain`` argument is how the discriminator's residual branches
    apply their sqrt(0.5) scaling inside the activation
    (reference: lib/model_zoo/migan.py:616-618).
    """

    alpha: float = 0.1
    gain: float = 1.0
    clamp: Optional[float] = None

    def __call__(self, x: jnp.ndarray, gain: float = 1.0) -> jnp.ndarray:
        g = (_SQRT2 if self.gain == "sqrt_2" else float(self.gain)) * gain
        c = float(self.clamp) * gain if self.clamp is not None else None
        x = jnp.where(x >= 0, x, x * jnp.asarray(self.alpha, x.dtype))
        if g != 1.0:
            x = x * jnp.asarray(g, x.dtype)
        if c is not None:
            x = jnp.clip(x, -c, c)
        return x


_UNITS = {
    "lrelu_agc": lrelu_agc,
    "none": None,
}


def _str2value(v: str):
    v = v.strip()
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    if v in ("True", "true"):
        return True
    if v in ("False", "false"):
        return False
    return v


def get_unit(spec: Optional[str]):
    """Parse an activation config string into a callable.

    Replicates the string-parsed activation factory that is part of the
    reference's config surface (reference: lib/model_zoo/common/utils.py:62-86),
    e.g. ``'lrelu_agc(alpha=0.2, gain=sqrt_2, clamp=256)'``.
    """
    if spec is None:
        return None
    m = re.match(r"^\s*([\w]+)\s*(?:\((.*)\))?\s*$", spec)
    if m is None:
        raise ValueError(f"bad unit spec: {spec!r}")
    name, argstr = m.group(1), m.group(2)
    cls = _UNITS[name]
    if cls is None:
        return None
    kwargs = {}
    if argstr:
        for part in argstr.split(","):
            k, _, v = part.partition("=")
            kwargs[k.strip()] = _str2value(v)
    return cls(**kwargs)
