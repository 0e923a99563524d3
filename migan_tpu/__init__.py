"""MI-GAN-TPU: a TPU-native (JAX/XLA/Pallas) image-inpainting framework.

A from-scratch rebuild of the capabilities of Picsart-AI-Research/MI-GAN
(reference: /root/reference) designed TPU-first:

- NHWC layout everywhere (TPU-native), params are plain pytrees.
- Resampling (`ops.upfirdn2d`) is a single `lax.conv_general_dilated` with
  lhs_dilation — the fused equivalent of the reference CUDA kernel
  (reference: torch_utils/ops/upfirdn2d.cu).
- Fully-convolutional: no fixed-resolution `filter_const` buffers
  (reference: lib/model_zoo/migan_inference.py:85); resolution is a compile-time
  shape bucket, not a baked parameter.
- Data parallel scaling via `jax.sharding.Mesh` + NamedSharding, not NCCL.
"""

__version__ = "0.1.0"
