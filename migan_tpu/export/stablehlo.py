"""StableHLO serialization — the TPU-native replacement for ONNX export.

Where the reference ships ONNX graphs (reference: scripts/
export_inference_model.py:166-173 opset 12; scripts/create_onnx_pipeline.py:
293-318 opset 17 with dynamic H/W axes), this framework serializes the jitted
program with `jax.export`:

  - `export_fn` captures params as constants and emits portable StableHLO
    bytes loadable by any jax.export-compatible runtime (incl. ahead-of-time
    deployment on TPU serving stacks).
  - dynamic H/W is expressed with jax.export symbolic shapes where the
    program allows it; the app pipeline uses per-bucket specialization.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jexport


def export_fn(fn: Callable, example_args: Sequence[jnp.ndarray],
              polymorphic_shapes: Optional[Sequence[Optional[str]]] = None,
              constraints: Sequence[str] = ()) -> bytes:
    """Serialize jit(fn) at the example (or symbolic) shapes to StableHLO
    bytes.

    polymorphic_shapes: per-arg dim specs, e.g. "1, h, w, 3" — one program
    serves every H/W (the analog of the reference's ONNX dynamic axes,
    scripts/create_onnx_pipeline.py:293-318).
    constraints: symbolic dim constraints such as "h >= 132" — needed when
    an op's lowering must bound a dim (e.g. reflect padding).
    """
    if polymorphic_shapes is not None:
        args_spec = jexport.symbolic_args_specs(example_args,
                                                polymorphic_shapes,
                                                constraints=constraints)
    else:
        args_spec = [jax.ShapeDtypeStruct(a.shape, a.dtype)
                     for a in example_args]
    exported = jexport.export(jax.jit(fn))(*args_spec)
    return bytes(exported.serialize())


def load_fn(data: bytes) -> Callable:
    """Deserialize StableHLO bytes back into a callable."""
    exported = jexport.deserialize(data)
    return exported.call


def save(path: str, fn: Callable, example_args,
         polymorphic_shapes=None, constraints: Sequence[str] = ()) -> None:
    with open(path, "wb") as f:
        f.write(export_fn(fn, example_args, polymorphic_shapes, constraints))


def load(path: str) -> Callable:
    with open(path, "rb") as f:
        return load_fn(f.read())
