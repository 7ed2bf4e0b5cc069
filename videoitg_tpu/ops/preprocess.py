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


def _resize_normalize(x: jax.Array, out_size: int, dtype) -> jax.Array:
    """fp32 RGB [T, H, W, 3] in [0, 255] -> normalized [T, S, S, 3]."""
    # Resize along H, W (trailing axes after moving channels out of the way).
    x = jnp.moveaxis(x, -1, 1)  # [T, C, H, W]
    x = pil_resize_uint8(x, out_size, out_size, filter="bicubic")
    x = jnp.moveaxis(x, 1, -1)  # [T, H, W, C]
    mean = jnp.asarray(SIGLIP_MEAN, dtype=jnp.float32) * 255.0
    std = jnp.asarray(SIGLIP_STD, dtype=jnp.float32) * 255.0
    x = (x - mean) / std
    return x.astype(dtype)


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
    return _resize_normalize(frames.astype(jnp.float32), out_size, dtype)


def yuv420_to_rgb(y: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """Limited-range BT.601 YUV420 planes -> fp32 RGB [T, H, W, 3] in [0, 255].

    Device-side counterpart of the host swscale conversion the RGB decode
    path performs (native/videodec.cpp convert_to_rgb): the decoder ships
    its native planes (half the bytes), chroma is bilinearly upsampled x2
    and the 3x3 colorspace affine runs on the VPU — all fused by XLA into
    the preprocess program. Matches the swscale fixed-point output within
    a few LSB (quantization + chroma-siting differences).
    """
    t, h, w = y.shape
    yf = 1.164383 * (y.astype(jnp.float32) - 16.0)
    uf = jax.image.resize(u.astype(jnp.float32), (t, h, w), method="bilinear")
    vf = jax.image.resize(v.astype(jnp.float32), (t, h, w), method="bilinear")
    uf = uf - 128.0
    vf = vf - 128.0
    r = yf + 1.596027 * vf
    g = yf - 0.391762 * uf - 0.812968 * vf
    b = yf + 2.017232 * uf
    # Round to integers: the RGB path feeds uint8-quantized pixels into the
    # resize; matching that keeps the two transfer modes within ~1 LSB.
    return jnp.round(jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0))


@partial(jax.jit, static_argnames=("out_size", "dtype"))
def preprocess_frames_yuv(
    y: jax.Array,
    u: jax.Array,
    v: jax.Array,
    out_size: int = 384,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """YUV420 uint8 planes -> normalized [T, out_size, out_size, 3].

    Same result as preprocess_frames on the RGB-decoded pixels (within
    colorspace rounding), with half the host->device transfer.
    """
    return _resize_normalize(yuv420_to_rgb(y, u, v), out_size, dtype)


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
