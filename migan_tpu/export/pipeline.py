"""End-to-end inpainting app pipeline as ONE jitted XLA program.

Re-implements the capability of the reference ONNX pipeline
(reference: scripts/create_onnx_pipeline.py:119-264): dynamic mask-bbox crop
with padding=128 and min-size=res, bilinear resize to model res, normalize,
generator forward, resize back, and a feathered composite
(mask max-pool 3x3 + gaussian blur k=5 sigma=1).

TPU-first formulation: the crop box is data-dependent, so instead of a
dynamic-shape slice (impossible under XLA) the crop+resize is a single
`jax.image.scale_and_translate` with traced scale/translation, and the
model output is painted back by the inverse transform restricted to the
bbox region. Image H/W are static per compiled bucket (the reference gets
dynamic axes from ONNX; here each (H, W) bucket compiles once — StableHLO
export supports symbolic H/W via jax.export shape polymorphism).

I/O contract matches the reference (README.md:223-227): uint8 RGB image
[1,H,W,3] + uint8 mask [1,H,W,1], 255 = known; returns uint8 composited
image.
"""

from __future__ import annotations


from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _gaussian_kernel(ksize: int = 5, sigma: float = 1.0) -> np.ndarray:
    # NOTE: reproduces the reference's GaussianSmoothing formula verbatim
    # (create_onnx_pipeline.py:81-87), which is exp(-((x-mean)/(2*sigma))**2)
    # — an effective stddev of sigma*sqrt(2), NOT the textbook
    # exp(-x^2/(2*sigma^2)). The numerics are the parity spec.
    ax = np.arange(ksize) - (ksize - 1) / 2.0
    g = np.exp(-((ax / (2.0 * sigma)) ** 2))
    k = np.outer(g, g)
    return (k / k.sum()).astype(np.float32)


def _reflect_pad_blur(mask: jnp.ndarray, ksize: int = 5,
                      sigma: float = 1.0) -> jnp.ndarray:
    """Gaussian blur with reflect padding (reference GaussianSmoothing,
    create_onnx_pipeline.py:107-116). mask: [1,H,W,1]."""
    pad = ksize // 2
    k = jnp.asarray(_gaussian_kernel(ksize, sigma))[:, :, None, None]
    x = jnp.pad(mask, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                mode="reflect")
    return lax.conv_general_dilated(
        x, k.astype(mask.dtype), (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _maxpool3(mask: jnp.ndarray) -> jnp.ndarray:
    return lax.reduce_window(mask, -jnp.inf, lax.max, (1, 3, 3, 1),
                             (1, 1, 1, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))


def get_masked_bbox(mask: jnp.ndarray, res: int, padding: int,
                    h: int, w: int):
    """Square crop box covering the hole, padded and clamped
    (reference create_onnx_pipeline.py:132-231). mask: [1,H,W,1] uint8
    255=known. Returns (x_min, x_max, y_min, y_max) traced int32."""
    m = mask[0, :, :, 0].astype(jnp.float32)
    xx = jnp.mean(m, axis=0)        # [W] column means
    yy = jnp.mean(m, axis=1)        # [H] row means
    w_idx = jnp.arange(w, dtype=jnp.int32)
    h_idx = jnp.arange(h, dtype=jnp.int32)
    x_masked = jnp.where(xx < 255.0, w_idx, w)
    y_masked = jnp.where(yy < 255.0, h_idx, h)
    x_min = jnp.min(x_masked)
    x_max = jnp.max(jnp.where(xx < 255.0, w_idx, 0))
    y_min = jnp.min(y_masked)
    y_max = jnp.max(jnp.where(yy < 255.0, h_idx, 0))
    # no-hole case: x_min=w > x_max=0 -> reference forces min<=max
    x_min, x_max = jnp.minimum(x_min, x_max), jnp.maximum(x_min, x_max)
    y_min, y_max = jnp.minimum(y_min, y_max), jnp.maximum(y_min, y_max)

    cnt_x = (x_min + x_max) // 2
    cnt_y = (y_min + y_max) // 2
    crop_size = jnp.maximum(x_max - x_min, y_max - y_min) + 2 * padding
    crop_size = jnp.maximum(crop_size, res)

    offset = crop_size // 2
    x_min = jnp.maximum(cnt_x - offset, 0)
    x_max = jnp.minimum(cnt_x + offset, w)
    y_min = jnp.maximum(cnt_y - offset, 0)
    y_max = jnp.minimum(cnt_y + offset, h)

    x_excess = jnp.maximum(crop_size - (x_max - x_min), 0)
    y_excess = jnp.maximum(crop_size - (y_max - y_min), 0)
    x_min = jnp.maximum(x_min - x_excess, 0)
    x_max = jnp.minimum(x_max + x_excess, w)
    y_min = jnp.maximum(y_min - y_excess, 0)
    y_max = jnp.minimum(y_max + y_excess, h)
    return x_min, x_max, y_min, y_max


def _crop_resize(img: jnp.ndarray, box, out_hw: Tuple[int, int],
                 method: str) -> jnp.ndarray:
    """Resize the bbox region of [1,H,W,C] to out_hw with a traced box."""
    oh, ow = out_hw
    if method == "nearest":
        # torchvision-legacy nearest: src = floor(dst * size_in / size_out),
        # realized as a gather (scale_and_translate has no nearest kernel).
        x_min, x_max, y_min, y_max = box
        H, W = img.shape[1], img.shape[2]
        ys = y_min + (jnp.arange(oh) * (y_max - y_min)) // oh
        xs = x_min + (jnp.arange(ow) * (x_max - x_min)) // ow
        ys = jnp.clip(ys, 0, H - 1)
        xs = jnp.clip(xs, 0, W - 1)
        out = jnp.take(img, ys, axis=1)
        out = jnp.take(out, xs, axis=2)
        return out.astype(jnp.float32)
    x_min, x_max, y_min, y_max = [b.astype(jnp.float32) for b in box]
    scale = jnp.stack([oh / (y_max - y_min), ow / (x_max - x_min)])
    translation = jnp.stack([-y_min * scale[0], -x_min * scale[1]])
    # antialias=False matches the reference's torch bilinear resize
    # (tvF.resize / F.interpolate default), keeping the generator input
    # numerically aligned when the crop downscales.
    return jax.image.scale_and_translate(
        img.astype(jnp.float32), (img.shape[0], oh, ow, img.shape[3]),
        (1, 2), scale, translation, method=method, antialias=False)


def _paste_resize(small: jnp.ndarray, box, out_hw: Tuple[int, int],
                  method: str = "linear") -> jnp.ndarray:
    """Inverse of _crop_resize: scale [1,res,res,C] into the bbox of a
    full-size canvas (values outside the bbox are irrelevant — masked)."""
    x_min, x_max, y_min, y_max = [b.astype(jnp.float32) for b in box]
    H, W = out_hw
    sh = (y_max - y_min) / small.shape[1]
    sw = (x_max - x_min) / small.shape[2]
    scale = jnp.stack([sh, sw])
    translation = jnp.stack([y_min, x_min])
    return jax.image.scale_and_translate(
        small, (small.shape[0], H, W, small.shape[3]), (1, 2), scale,
        translation, method=method, antialias=False)


def _make_stage_fns(resolution: int, padding: int):
    """The pipeline's pre/post halves around the generator forward —
    shared verbatim by the monolithic program (make_pipeline) and the
    staged serving path (make_pipeline_stages), so both trace the same
    math."""

    def pre(image: jnp.ndarray, mask: jnp.ndarray):
        """uint8 [1,H,W,3] + [1,H,W,1] -> (generator input [1,res,res,4],
        bbox [4] int32)."""
        assert image.dtype == jnp.uint8 and mask.dtype == jnp.uint8
        H, W = image.shape[1], image.shape[2]
        box = get_masked_bbox(mask, resolution, padding, H, W)

        # crop + resize to model res (bilinear image / nearest mask —
        # reference preprocess, create_onnx_pipeline.py:233-239)
        img_s = _crop_resize(image, box, (resolution, resolution), "linear")
        # The reference resizes the uint8 image tensor, which rounds back to
        # uint8 *before* normalization (tvF.resize on uint8,
        # create_onnx_pipeline.py:233-236); match that quantization so the
        # generator sees identical inputs.
        img_s = jnp.round(jnp.clip(img_s, 0.0, 255.0))
        mask_s = _crop_resize(mask, box, (resolution, resolution),
                              "nearest")
        img_n = img_s * (2.0 / 255.0) - 1.0
        mask_n = mask_s / 255.0
        x = jnp.concatenate([mask_n - 0.5, img_n * mask_n], axis=-1)
        return x, jnp.stack(box)

    def post(image: jnp.ndarray, mask: jnp.ndarray, out: jnp.ndarray,
             box4: jnp.ndarray) -> jnp.ndarray:
        """Generator output [1,res,res,3] in [-1,1] + the pre() bbox ->
        composited uint8 image at original size."""
        H, W = image.shape[1], image.shape[2]
        box = (box4[0], box4[1], box4[2], box4[3])
        out = jnp.clip((out * 0.5 + 0.5) * 255.0, 0, 255)

        # paste the model output back into full-image coordinates
        out_full = _paste_resize(out, box, (H, W))

        # feathered composite at original pixel scale
        # (reference postprocess, create_onnx_pipeline.py:241-250)
        m = mask.astype(jnp.float32)
        m = _maxpool3(m)
        m = _reflect_pad_blur(m)
        m = m / 255.0
        composed = image.astype(jnp.float32) * m + out_full * (1.0 - m)
        composed = jnp.clip(composed, 0, 255)

        # only the bbox region changes (reference pastes into a slice)
        yy = jnp.arange(H)[None, :, None, None]
        xx = jnp.arange(W)[None, None, :, None]
        x_min, x_max, y_min, y_max = box
        region = ((yy >= y_min) & (yy < y_max)
                  & (xx >= x_min) & (xx < x_max))
        result = jnp.where(region, composed,
                           image.astype(jnp.float32))
        return result.astype(jnp.uint8)

    return pre, post


def make_pipeline(generator_fn: Callable[[jnp.ndarray], jnp.ndarray],
                  resolution: int, padding: int = 128):
    """Build pipeline(image_u8 [1,H,W,3], mask_u8 [1,H,W,1]) -> uint8 image.

    generator_fn: jittable [1,res,res,4] -> [1,res,res,3] in [-1,1].
    """
    pre, post = _make_stage_fns(resolution, padding)

    @jax.jit
    def pipeline(image: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        x, box4 = pre(image, mask)
        out = generator_fn(x)
        return post(image, mask, out, box4)

    return pipeline


def make_pipeline_stages(resolution: int, padding: int = 128):
    """The serving decomposition: (jitted pre, jitted post) around an
    EXTERNAL generator dispatch. The generator input/output shapes are
    bucket-independent ([N, res, res, 4/3]), so a server can batch the
    G forwards of concurrent requests across size buckets while pre/post
    stay per-request (cli/serve.py::PipelineRunner). Same traced math as
    make_pipeline (shared stage functions)."""
    pre, post = _make_stage_fns(resolution, padding)
    return jax.jit(pre), jax.jit(post)
