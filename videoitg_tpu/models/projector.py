"""seq_mlp projector: adaptive spatial pooling + 2-layer MLP.

Behavior contract (reference eagle/model/multimodal_projector/mlp_proj.py):
per video, [T, P, C] tower features are viewed as T grids of sqrt(P)^2,
bilinearly resized (torch align_corners=False) to HW x HW where
HW = floor(sqrt(vision_token_num / T)) at inference (training draws
HW ~ Uniform[vision_min_num, HW]), then pushed through
Linear(C->D) / GELU(exact) / Linear(D->D).

TPU-first: HW is a *static* compile-time int (one compiled program per
(T-bucket, HW) pair — the eval workload is dominated by T=512, HW=5), and
the bilinear resize is two tiny precomputed weight-matrix matmuls
(ops/resize.py) fused by XLA into the MLP GEMM's producer.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from videoitg_tpu.config import ProjectorConfig
from videoitg_tpu.models.common import gelu_exact, init_linear, linear
from videoitg_tpu.ops.resize import bilinear_resize_matrix


def init_projector(key, cfg: ProjectorConfig, dtype=jnp.float32) -> dict:
    """Init per cfg.projector_type (reference builder.py:48-69 families).

    seq_mlp and mlpNx_gelu share the fc{i} naming (seq_mlp IS a 2-layer MLP
    plus budget pooling); "linear" is one fc1; "identity" has no params.
    """
    if cfg.projector_type == "identity":
        return {}
    if cfg.projector_type == "linear":
        return {"fc1": init_linear(key, cfg.input_dim, cfg.output_dim, dtype=dtype)}
    depth = 2 if cfg.projector_type == "seq_mlp" else _mlp_depth(cfg.projector_type)
    keys = jax.random.split(key, depth)
    params = {"fc1": init_linear(keys[0], cfg.input_dim, cfg.output_dim, dtype=dtype)}
    for i in range(1, depth):
        params[f"fc{i + 1}"] = init_linear(
            keys[i], cfg.output_dim, cfg.output_dim, dtype=dtype)
    return params


def pool_frame_grid(feats: jax.Array, hw: int) -> jax.Array:
    """[..., P, C] -> [..., hw*hw, C] bilinear pool over the sqrt(P) grid.

    Exactly torch F.interpolate(..., mode='bilinear', align_corners=False)
    on each frame's feature grid (reference mlp_proj.py:61-67).
    """
    *lead, p, c = feats.shape
    ori = int(math.isqrt(p))
    assert ori * ori == p, f"patch count {p} is not square"
    if hw >= ori:
        return feats
    m = jnp.asarray(bilinear_resize_matrix(ori, hw), dtype=jnp.float32)  # [hw, ori]
    x = feats.reshape(*lead, ori, ori, c)
    # Resize rows then columns in fp32 (interp weights are exact in fp32;
    # bf16 accumulation here would perturb score ordering).
    xf = x.astype(jnp.float32)
    xf = jnp.einsum("oh,...hwc->...owc", m, xf)
    xf = jnp.einsum("ow,...hwc->...hoc", m, xf)
    return xf.reshape(*lead, hw * hw, c).astype(feats.dtype)


def project_frames(params: dict, feats: jax.Array, hw: int) -> jax.Array:
    """[T, P, C] tower features -> [T, hw*hw, D] LM-space tokens (seq_mlp)."""
    pooled = pool_frame_grid(feats, hw)
    return linear(params["fc2"], gelu_exact(linear(params["fc1"], pooled)))


def apply_projector(params: dict, feats: jax.Array, cfg: ProjectorConfig,
                    hw: int | None = None) -> jax.Array:
    """Type-dispatched projector application (reference builder.py:48-69).

    seq_mlp pools to the per-video token budget (hw required); the other
    families are per-token maps used by the VLM pretrain/SFT stages."""
    t = cfg.projector_type
    if t == "seq_mlp":
        assert hw is not None, "seq_mlp needs the static HW"
        return project_frames(params, feats, hw)
    if t == "identity":
        return feats
    if t == "linear":
        return linear(params["fc1"], feats)
    depth = _mlp_depth(t)
    x = linear(params["fc1"], feats)
    for i in range(1, depth):
        x = linear(params[f"fc{i + 1}"], gelu_exact(x))
    return x


def frame_token_count(cfg: ProjectorConfig, hw: int, num_patches: int) -> int:
    """LM tokens contributed per frame: seq_mlp pools to hw^2; the other
    families keep one token per tower patch."""
    return hw * hw if cfg.projector_type == "seq_mlp" else num_patches


def _mlp_depth(projector_type: str) -> int:
    import re

    m = re.fullmatch(r"mlp(\d+)x_gelu", projector_type)
    if not m:
        raise ValueError(f"unknown projector type {projector_type!r}")
    return int(m.group(1))


def inference_hw(cfg: ProjectorConfig, num_frames: int, ori_hw: int = 27) -> int:
    """Static HW for an inference call. Parity: mlp_proj.py:48,54."""
    return cfg.tokens_hw(num_frames, ori_hw)


def training_hw(cfg: ProjectorConfig, num_frames: int, ori_hw: int, rng: "object") -> int:
    """Host-side random HW draw for training. Parity: mlp_proj.py:52 —
    torch.randint(vision_min_num, HW+1) then clamp to the native grid.
    `rng` is a python random.Random (host-side; HW must be static)."""
    hw_max = math.floor(math.sqrt(cfg.vision_token_num / num_frames))
    hw = rng.randint(cfg.vision_min_num, hw_max)  # inclusive both ends
    return min(hw, ori_hw)
