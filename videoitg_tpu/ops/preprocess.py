"""Fused SigLIP image preprocessing: resize + rescale + normalize.

Parity target: HF SiglipImageProcessor as used by the reference
(eagle/model/multimodal_encoder/clip_encoder.py:115, infer.py:55) —
PIL bicubic-antialias resize to 384x384, rescale by 1/255, normalize with
mean=std=0.5 per channel. On TPU the whole chain is one jitted function:
two resize matmuls plus a fused affine; XLA emits a single fusion feeding
the patch-embed conv. Layout is NHWC (TPU-native) rather than the
reference's NCHW.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from videoitg_tpu.ops.resize import pil_resize_uint8

# SigLIP normalization (HF SiglipImageProcessor defaults).
SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)


@partial(jax.jit, static_argnames=("out_size", "dtype"))
def preprocess_frames(
    frames: jax.Array,
    out_size: int = 384,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """uint8 [T, H, W, 3] -> normalized [T, out_size, out_size, 3].

    Resize happens in fp32 (PIL computes in its fixed-point/float pipeline;
    fp32 keeps us within quantization error), normalization is fused, and
    the result is cast to the model compute dtype.
    """
    x = frames.astype(jnp.float32)
    # Resize along H, W (trailing axes after moving channels out of the way).
    x = jnp.moveaxis(x, -1, 1)  # [T, C, H, W]
    x = pil_resize_uint8(x, out_size, out_size, filter="bicubic")
    x = jnp.moveaxis(x, 1, -1)  # [T, H, W, C]
    mean = jnp.asarray(SIGLIP_MEAN, dtype=jnp.float32) * 255.0
    std = jnp.asarray(SIGLIP_STD, dtype=jnp.float32) * 255.0
    x = (x - mean) / std
    return x.astype(dtype)


def preprocess_frames_reference(frames: np.ndarray, out_size: int = 384) -> np.ndarray:
    """Pure-PIL reference path (exact HF SiglipImageProcessor semantics).

    Used in tests and as a slow fallback; returns NHWC float32.
    """
    from PIL import Image

    out = np.empty((frames.shape[0], out_size, out_size, 3), dtype=np.float32)
    for i, frame in enumerate(frames):
        img = Image.fromarray(frame).resize((out_size, out_size), Image.BICUBIC)
        out[i] = np.asarray(img, dtype=np.float32)
    mean = np.asarray(SIGLIP_MEAN, dtype=np.float32) * 255.0
    std = np.asarray(SIGLIP_STD, dtype=np.float32) * 255.0
    return (out - mean) / std
