"""Shared functional building blocks for the model stack.

Parameters are plain pytrees (nested dicts of jnp arrays) — no module
framework. Per-layer weights are stacked along a leading axis and the layer
loop is a lax.scan, so an N-layer model traces once regardless of depth and
jax.checkpoint can rematerialize per scan step. Linear weights are stored
[in, out] (transposed from torch's [out, in]) so application is `x @ w`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _lora_delta(params, x: jax.Array) -> jax.Array:
    delta = (x @ params["lora_a"]) @ params["lora_b"]
    return delta * params["lora_scale"].astype(delta.dtype)


def linear(params, x: jax.Array) -> jax.Array:
    if "w_q" in params:  # weight-only int8 serving path (ops/quant.py)
        from videoitg_tpu.ops.quant import quantized_linear

        y = quantized_linear(params, x)
        if "lora_a" in params:  # QLoRA: adapters over a quantized base
            y = y + _lora_delta(params, x).astype(y.dtype)
        return y
    if "w_q4" in params:  # packed-int4 serving path (ops/quant.py)
        from videoitg_tpu.ops.quant import quantized_linear_int4

        y = quantized_linear_int4(params, x)
        if "lora_a" in params:  # 4-bit QLoRA (reference: bnb 4bit + peft)
            y = y + _lora_delta(params, x).astype(y.dtype)
        return y
    y = x @ params["w"]
    if "lora_a" in params:  # LoRA adapter (train/lora.py)
        y = y + _lora_delta(params, x).astype(y.dtype)
    if "b" in params:
        y = y + params["b"]
    return y


def init_linear(key, d_in: int, d_out: int, bias: bool = True, dtype=jnp.float32):
    scale = d_in ** -0.5
    p = {"w": jax.random.normal(key, (d_in, d_out), dtype=jnp.float32) * scale}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype=jnp.float32)
    return jax.tree.map(lambda a: a.astype(dtype), p)


def rms_norm(params, x: jax.Array, eps: float) -> jax.Array:
    """RMSNorm with fp32 statistics (Qwen2 semantics)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (xf * params["scale"].astype(jnp.float32)).astype(x.dtype)


def layer_norm(params, x: jax.Array, eps: float) -> jax.Array:
    """LayerNorm with fp32 statistics (SigLIP semantics)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = xf * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def gelu_tanh(x: jax.Array) -> jax.Array:
    """gelu_pytorch_tanh — SigLIP's activation."""
    return jax.nn.gelu(x, approximate=True)


def gelu_exact(x: jax.Array) -> jax.Array:
    """torch nn.GELU() default (erf form) — the seq_mlp projector's activation
    (reference mlp_proj.py:33 uses nn.GELU())."""
    return jax.nn.gelu(x, approximate=False)


def rope_frequencies(head_dim: int, theta: float) -> jax.Array:
    """[head_dim/2] inverse frequencies, fp32."""
    exponents = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    return 1.0 / (theta ** exponents)


def apply_rope(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """Rotary embedding, NeoX/Qwen2 'rotate_half' convention.

    x: [B, H, S, D]; positions: [B, S] int32. Angles in fp32 (HF computes the
    cos/sin table in fp32 then casts — matching that keeps logits aligned).
    """
    d = x.shape[-1]
    inv_freq = rope_frequencies(d, theta)  # [D/2]
    angles = positions.astype(jnp.float32)[:, :, None] * inv_freq[None, None, :]
    cos = jnp.cos(angles)[:, None, :, :]  # [B,1,S,D/2]
    sin = jnp.sin(angles)[:, None, :, :]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    out = jnp.concatenate([xf1 * cos - xf2 * sin, xf2 * cos + xf1 * sin], axis=-1)
    return out.astype(x.dtype)


def fused_qkv(p_q: dict, p_k: dict, p_v: dict, x: jax.Array):
    """Apply q/k/v projections as one concatenated GEMM.

    Exact: concatenating weight columns commutes with the matmul; one
    [*, in]x[in, q+k+v] GEMM keeps the MXU busier than three narrow ones.
    Falls back to separate linears when any projection is quantized or
    LoRA-adapted (those paths have their own fused forms).
    """
    if any(("w_q" in p or "w_q4" in p or "lora_a" in p) for p in (p_q, p_k, p_v)):
        return linear(p_q, x), linear(p_k, x), linear(p_v, x)
    dq = p_q["w"].shape[-1]
    dk = p_k["w"].shape[-1]
    w = jnp.concatenate([p_q["w"], p_k["w"], p_v["w"]], axis=-1)
    y = x @ w
    if "b" in p_q:
        y = y + jnp.concatenate([p_q["b"], p_k["b"], p_v["b"]], axis=-1)
    return y[..., :dq], y[..., dq : dq + dk], y[..., dq + dk :]


def stack_layer_params(layers: list) -> dict:
    """Stack a list of identical pytrees along a new leading axis (for scan)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *layers)


def slice_layer_params(stacked, n: int):
    """First n layers of a stacked-layer pytree."""
    return jax.tree.map(lambda x: x[:n], stacked)
