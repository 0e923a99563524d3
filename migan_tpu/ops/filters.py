"""FIR filter preparation for resampling ops.

Matches the semantics of the reference `setup_filter`
(reference: torch_utils/ops/upfirdn2d.py:72-116) but returns jnp arrays.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def setup_filter(
    f,
    normalize: bool = True,
    flip_filter: bool = False,
    gain: float = 1.0,
    separable: bool | None = None,
):
    """Prepare a 2D FIR filter for :func:`upfirdn2d`.

    Args:
        f: filter taps — scalar, 1-D (separable or outer-product source),
           2-D, or None (identity).
        normalize: scale so DC gain is 1.
        flip_filter: pre-flip the taps.
        gain: overall magnitude scale; applied as ``gain ** (ndim / 2)``.
        separable: force/forbid returning a 1-D separable filter. Default:
           separable iff 1-D with >= 8 taps.

    Returns:
        float32 jnp array, shape [fh, fw] (non-separable) or [taps] (separable).
    """
    if f is None:
        f = 1
    f = np.asarray(f, dtype=np.float64)
    assert f.ndim in (0, 1, 2)
    assert f.size > 0
    if f.ndim == 0:
        f = f[np.newaxis]

    if separable is None:
        separable = f.ndim == 1 and f.size >= 8
    if f.ndim == 1 and not separable:
        f = np.outer(f, f)
    assert f.ndim == (1 if separable else 2)

    if normalize:
        f = f / f.sum()
    if flip_filter:
        f = f[::-1] if f.ndim == 1 else f[::-1, ::-1]
    f = f * (gain ** (f.ndim / 2))
    return jnp.asarray(f, dtype=jnp.float32)


def parse_scaling(scaling):
    """Normalize an int or (x, y) pair of scaling factors."""
    if isinstance(scaling, int):
        scaling = [scaling, scaling]
    sx, sy = (int(s) for s in scaling)
    assert sx >= 1 and sy >= 1
    return sx, sy


def parse_padding(padding):
    """Normalize padding to (px0, px1, py0, py1)."""
    if isinstance(padding, int):
        padding = [padding, padding]
    padding = [int(p) for p in padding]
    if len(padding) == 2:
        px, py = padding
        padding = [px, px, py, py]
    px0, px1, py0, py1 = padding
    return px0, px1, py0, py1


def filter_size(f):
    """Return (fw, fh) of a prepared filter (None = identity 1x1)."""
    if f is None:
        return 1, 1
    assert f.ndim in (1, 2)
    fw = int(f.shape[-1])
    fh = int(f.shape[0])
    return fw, fh
