"""Separable image/feature resizing as precomputed weight matrices.

TPU-first design note: the reference resizes with torch F.interpolate
(bilinear, align_corners=False; eagle/model/multimodal_projector/mlp_proj.py:61-67)
and with PIL bicubic-antialias inside HF SiglipImageProcessor. Both are
separable linear maps, so instead of gather-based interpolation (hostile to
the MXU) we precompute a dense [out, in] weight matrix per axis once at trace
time and apply it with two matmuls. This is bit-for-bit the same math,
XLA-fusable, and runs on the systolic array.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np

__all__ = [
    "bilinear_resize_matrix",
    "pil_resample_matrix",
    "pil_resize_uint8",
    "resize_hw",
]


@lru_cache(maxsize=None)
def bilinear_resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out_size, in_size] weights matching torch bilinear align_corners=False.

    Semantics (torch area_pixel_compute_source_index): the source coordinate
    of output pixel o is max(0, (o + 0.5) * (in/out) - 0.5); two taps at
    floor(src) and min(floor(src)+1, in-1) with weights (1-frac, frac).
    No antialiasing (matches F.interpolate default used by the reference
    projector at mlp_proj.py:61-67).
    """
    w = np.zeros((out_size, in_size), dtype=np.float64)
    scale = in_size / out_size
    for o in range(out_size):
        src = (o + 0.5) * scale - 0.5
        if src < 0.0:
            src = 0.0
        i0 = int(math.floor(src))
        if i0 > in_size - 1:
            i0 = in_size - 1
        i1 = min(i0 + 1, in_size - 1)
        frac = src - i0
        w[o, i0] += 1.0 - frac
        w[o, i1] += frac
    return w.astype(np.float32)


def _bicubic_kernel(x: float, a: float = -0.5) -> float:
    """PIL's bicubic filter (Catmull-Rom family, a=-0.5)."""
    x = abs(x)
    if x < 1.0:
        return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0
    if x < 2.0:
        return (((x - 5.0) * x + 8.0) * x - 4.0) * a
    return 0.0


def _bilinear_kernel(x: float) -> float:
    x = abs(x)
    return 1.0 - x if x < 1.0 else 0.0


_PIL_FILTERS = {
    "bicubic": (_bicubic_kernel, 2.0),
    "bilinear": (_bilinear_kernel, 1.0),
}


@lru_cache(maxsize=None)
def pil_resample_matrix(in_size: int, out_size: int, filter: str = "bicubic") -> np.ndarray:
    """[out_size, in_size] weights matching PIL Image.resize with antialias.

    Implements PIL's precompute_coeffs (libImaging/Resample.c): when
    downscaling, the kernel is stretched by the scale factor (antialiasing);
    weights within the clipped window are renormalized to sum to 1. PIL's
    uint8 path then quantizes coefficients to fixed point; we keep float32,
    which agrees to ~1e-2 of a 1/255 level. HF SiglipImageProcessor resizes
    with exactly this filter (resample=BICUBIC) before rescale+normalize.
    """
    kernel, support0 = _PIL_FILTERS[filter]
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = support0 * filterscale
    ss = 1.0 / filterscale
    w = np.zeros((out_size, in_size), dtype=np.float64)
    for o in range(out_size):
        center = (o + 0.5) * scale
        xmin = max(0, int(center - support + 0.5))
        xmax = min(in_size, int(center + support + 0.5))
        weights = [kernel((x - center + 0.5) * ss) for x in range(xmin, xmax)]
        total = sum(weights)
        if total != 0.0:
            weights = [v / total for v in weights]
        w[o, xmin:xmax] = weights
    return w.astype(np.float32)


def resize_hw(images, out_h: int, out_w: int, method: str = "torch_bilinear"):
    """Resize [..., H, W] arrays along the trailing two axes via matmuls.

    `images` may be numpy or jax arrays; matrices are baked in as constants
    at trace time. Accumulation happens in the input dtype's matmul-preferred
    precision (callers on TPU should pass fp32/bf16 and let XLA fuse).
    """
    import jax.numpy as jnp

    h, w = images.shape[-2], images.shape[-1]
    if method == "torch_bilinear":
        mh = bilinear_resize_matrix(h, out_h)
        mw = bilinear_resize_matrix(w, out_w)
    elif method in ("pil_bicubic", "pil_bilinear"):
        mh = pil_resample_matrix(h, out_h, method.split("_")[1])
        mw = pil_resample_matrix(w, out_w, method.split("_")[1])
    else:
        raise ValueError(f"unknown resize method {method!r}")
    x = jnp.asarray(images)
    # [..., H, W] -> [..., out_h, W] -> [..., out_h, out_w]
    x = jnp.einsum("oh,...hw->...ow", jnp.asarray(mh), x)
    x = jnp.einsum("ow,...hw->...ho", jnp.asarray(mw), x)
    return x


def pil_resize_uint8(images, out_h: int, out_w: int, filter: str = "bicubic"):
    """Bit-faithful emulation of PIL Image.resize on uint8 images.

    PIL runs the horizontal pass first, rounds half-up and clips the
    intermediate to uint8, then runs the vertical pass and rounds/clips
    again (libImaging/Resample.c, clip8). Matching that clipping matters:
    bicubic overshoot on high-frequency content otherwise diverges by tens
    of gray levels. Input [..., H, W] float32 in [0, 255]; output same
    layout, integral float32 values in [0, 255].
    """
    import jax.numpy as jnp

    h, w = images.shape[-2], images.shape[-1]
    mh = jnp.asarray(pil_resample_matrix(h, out_h, filter))
    mw = jnp.asarray(pil_resample_matrix(w, out_w, filter))

    def _round_clip8(v):
        return jnp.clip(jnp.floor(v + 0.5), 0.0, 255.0)

    x = jnp.asarray(images, dtype=jnp.float32)
    x = jnp.einsum("ow,...hw->...ho", mw, x)  # horizontal pass
    x = _round_clip8(x)
    # x is now [..., H, out_w]
    x = jnp.einsum("oh,...hw->...ow", mh, x)  # vertical pass -> [..., out_h, out_w]
    return _round_clip8(x)
