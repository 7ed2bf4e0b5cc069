"""Weight-only int8 quantization for serving.

The 8B selector in bf16 (~16.2 GB) does not fit a single v5e chip (16 GB
HBM); per-output-channel symmetric int8 on the LM linears brings it to
~10.5 GB with bf16 activations and fp32 accumulation. Because quantization
is symmetric (zero-point 0), dequant commutes with the matmul:
x @ (w_q * s) == (x @ w_q) * s — XLA keeps int8 weights in HBM, converts
in the GEMM producer, and applies the scale to the [*, out] result.

This is a serving OPTION (bench/single-chip deployments); parity-critical
paths keep bf16. The reference's analogous knob is bitsandbytes 8/4-bit
loading (its builder.py:48-57).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

_QWEN2_LINEAR_KEYS = ("q", "k", "v", "o", "gate", "up", "down")
_SIGLIP_LINEAR_KEYS = ("q", "k", "v", "o", "fc1", "fc2")


def quantize_linear_int8(lin: dict) -> dict:
    """{'w': [in,out] or stacked [L,in,out], 'b'?} ->
    {'w_q': int8, 'scale': fp32 [out] / [L,out], 'b'?}.

    The reduction is over the INPUT axis (axis=-2), never a stacked-layer
    axis, so per-layer scales survive lax.scan's leading-axis slicing
    (models/common.py stacks layer weights on axis 0)."""
    w = lin["w"].astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=-2)  # per output channel: [..., out]
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    w_q = jnp.clip(jnp.round(w / scale[..., None, :]), -127, 127).astype(jnp.int8)
    out = {"w_q": w_q, "scale": scale.astype(jnp.float32)}
    if "b" in lin:
        out["b"] = lin["b"]
    return out


def is_quantized(lin: dict) -> bool:
    return isinstance(lin, dict) and "w_q" in lin


def is_quantized_tree(params) -> bool:
    """True if any linear in the tree is int8/int4-quantized."""

    def rec(t):
        if isinstance(t, dict):
            return "w_q" in t or "w_q4" in t or any(rec(v) for v in t.values())
        return False

    return rec(params)


def _int_weight_matmul(w_q: jax.Array, scale: jax.Array, x: jax.Array,
                       bias, act_q: bool) -> jax.Array:
    """Shared core of the int8/int4 linear paths: x @ dequant(w_q) with the
    per-out-channel scale applied post-GEMM; with act_q, activations are
    dynamically quantized per row (symmetric int8) so the GEMM runs
    int8 x int8 on the MXU (~2x bf16 peak on v5e), int32 accumulation."""
    if act_q:
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        x_scale = jnp.where(amax == 0, 1.0, amax / 127.0)
        x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale),
                       -127, 127).astype(jnp.int8)
        y = jnp.einsum("...i,io->...o", x_q, w_q,
                       preferred_element_type=jnp.int32)
        y = (y.astype(jnp.float32) * x_scale * scale).astype(x.dtype)
    else:
        y = jnp.einsum("...i,io->...o", x, w_q.astype(x.dtype),
                       preferred_element_type=jnp.float32)
        y = (y * scale).astype(x.dtype)
    if bias is not None:
        y = y + bias
    return y


def quantized_linear(lin: dict, x: jax.Array) -> jax.Array:
    """x @ dequant(w) with the scale applied post-GEMM.

    The act_q marker opts into dynamic per-token activation quantization
    (see _int_weight_matmul); it perturbs numerics more than weight-only,
    so the faithful serving tier leaves it off. (The marker's value is None
    so the flag lives in the pytree STRUCTURE — static under jit — rather
    than as a traced leaf.)

    VIDEOITG_QGEMM=1 routes act_q linears through the Pallas fused
    quantize-into-GEMM kernel (ops/quant_gemm.py) — a measured probe, off
    by default (ledger in docs/PERF.md).
    """
    import os

    if "act_q" in lin and os.environ.get("VIDEOITG_QGEMM") == "1":
        from videoitg_tpu.ops.quant_gemm import act8_linear, shapes_supported

        if shapes_supported(lin, x):
            return act8_linear(lin, x)
    return _int_weight_matmul(lin["w_q"], lin["scale"], x, lin.get("b"),
                              act_q="act_q" in lin)


def quantize_linear_int4(lin: dict) -> dict:
    """{'w': [..., in, out]} -> {'w_q4': int8 [..., in/2, out] (two nibbles
    per byte), 'scale4': fp32 [..., out], 'b'?}.

    int4 values live PACKED inside int8 bytes — no int4-dtype array is ever
    created (eager int4 ops RecursionError this sandbox's TPU plugin; the
    packed form is also what survives orbax/safetensors round-trips). Byte
    layout: low nibble = row i, high nibble = row i + in/2, so unpacking is
    two arithmetic shifts and a concat. Range is symmetric [-7, 7]
    (scale = amax/7). The reference's 4-bit knob is bitsandbytes
    load_in_4bit (its builder.py:48-57)."""
    w = lin["w"].astype(jnp.float32)
    in_dim = w.shape[-2]
    assert in_dim % 2 == 0, f"int4 packing needs even in-dim, got {in_dim}"
    amax = jnp.max(jnp.abs(w), axis=-2)
    scale = jnp.where(amax == 0, 1.0, amax / 7.0)
    w_q = jnp.clip(jnp.round(w / scale[..., None, :]), -7, 7).astype(jnp.int8)
    lo = w_q[..., : in_dim // 2, :]
    hi = w_q[..., in_dim // 2 :, :]
    packed = jnp.bitwise_or(
        jnp.bitwise_and(lo, 0xF), jnp.left_shift(hi, 4)
    ).astype(jnp.int8)
    out = {"w_q4": packed, "scale4": scale.astype(jnp.float32)}
    if "b" in lin:
        out["b"] = lin["b"]
    return out


def unpack_int4(packed: jax.Array) -> jax.Array:
    """int8 [..., in/2, out] -> int8 [..., in, out] in [-7, 7] (jit-safe)."""
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)  # sign-extend low
    hi = jnp.right_shift(packed, 4)                     # arithmetic shift
    return jnp.concatenate([lo, hi], axis=-2)


def quantized_linear_int4(lin: dict, x: jax.Array) -> jax.Array:
    """x @ dequant4(w): unpack nibbles under jit, then the shared int path
    (unpacked int4 weights are valid int8 MXU operands)."""
    return _int_weight_matmul(unpack_int4(lin["w_q4"]), lin["scale4"], x,
                              lin.get("b"), act_q="act_q" in lin)


def quantize_qwen2_int4(lm_params: dict) -> dict:
    """int4 weights for all decoder-layer linears (embeddings/norms bf16)."""
    out = dict(lm_params)
    layers = dict(lm_params["layers"])
    for key in _QWEN2_LINEAR_KEYS:
        layers[key] = quantize_linear_int4(layers[key])
    out["layers"] = layers
    return out


def enable_act_quant(tower_params: dict, keys=_QWEN2_LINEAR_KEYS) -> dict:
    """Mark every quantized layer linear for dynamic activation quant."""
    out = dict(tower_params)
    layers = dict(tower_params["layers"])
    for key in keys:
        if "w_q" in layers[key] or "w_q4" in layers[key]:
            lin = dict(layers[key])
            lin["act_q"] = None  # structural marker (see quantized_linear)
            layers[key] = lin
    out["layers"] = layers
    return out


def quantize_siglip_int8(vision_params: dict) -> dict:
    """Weight-only int8 for the vision tower's encoder linears (patch/pos
    embeddings stay bf16 — small and precision-sensitive)."""
    out = dict(vision_params)
    layers = dict(vision_params["layers"])
    for key in _SIGLIP_LINEAR_KEYS:
        layers[key] = quantize_linear_int8(layers[key])
    out["layers"] = layers
    return out


def quantize_qwen2_int8(lm_params: dict) -> dict:
    """Quantize all decoder-layer linears of a qwen2 param tree (embeddings,
    norms, and any lm_head stay bf16 — they are small or precision-critical)."""
    out = dict(lm_params)
    layers = dict(lm_params["layers"])
    for key in _QWEN2_LINEAR_KEYS:
        layers[key] = quantize_linear_int8(layers[key])
    out["layers"] = layers
    return out


def _init_qwen2_quantized(key, cfg, dtype, to_q) -> dict:
    """Shared skeleton for random-init quantized qwen2 trees (bench/smoke):
    decoder linears via to_q, bf16 embeddings/norms."""
    h = cfg.hidden_size
    shapes = {
        "q": (h, cfg.q_dim), "k": (h, cfg.kv_dim), "v": (h, cfg.kv_dim),
        "o": (cfg.q_dim, h), "gate": (h, cfg.intermediate_size),
        "up": (h, cfg.intermediate_size), "down": (cfg.intermediate_size, h),
    }
    biased = {"q", "k", "v"}
    keys = jax.random.split(key, len(shapes) + 2)
    layers = {}
    for i, (name, shape) in enumerate(shapes.items()):
        lin = to_q((cfg.num_layers,) + shape, keys[i])
        if name in biased:
            lin["b"] = jnp.zeros((cfg.num_layers, shape[-1]), dtype=dtype)
        layers[name] = lin
    layers["input_norm"] = {"scale": jnp.ones((cfg.num_layers, h), dtype)}
    layers["post_attn_norm"] = {"scale": jnp.ones((cfg.num_layers, h), dtype)}
    return {
        "embed": {"w": (jax.random.normal(keys[-2], (cfg.vocab_size, h), jnp.bfloat16)
                        * 0.02).astype(dtype)},
        "layers": layers,
        "final_norm": {"scale": jnp.ones((h,), dtype)},
    }


def init_qwen2_int8(key, cfg, dtype=jnp.bfloat16) -> dict:
    """Random-init a qwen2 tree directly in int8 serving form.

    For benchmarking the 8B architecture on one chip without ever
    materializing bf16 weights (which would not fit HBM alongside the int8
    copy during quantization).
    """
    def to_q(shape_like_lin, k):
        kw, _ = jax.random.split(k)
        w_q = jax.random.randint(kw, shape_like_lin, -127, 128, dtype=jnp.int8)
        # [L, out] — must carry the stacked-layer axis so lax.scan slices it.
        scale = jnp.full(shape_like_lin[:-2] + shape_like_lin[-1:], 0.01,
                         dtype=jnp.float32)
        return {"w_q": w_q, "scale": scale}

    return _init_qwen2_quantized(key, cfg, dtype, to_q)


def init_qwen2_int4(key, cfg, dtype=jnp.bfloat16) -> dict:
    """Random-init a qwen2 tree directly in packed-int4 serving form."""
    def to_q(shape_like_lin, k):
        kw, _ = jax.random.split(k)
        packed_shape = shape_like_lin[:-2] + (shape_like_lin[-2] // 2,
                                              shape_like_lin[-1])
        w_q4 = jax.random.randint(kw, packed_shape, -128, 128,
                                  dtype=jnp.int32).astype(jnp.int8)
        scale = jnp.full(shape_like_lin[:-2] + shape_like_lin[-1:], 0.02,
                         dtype=jnp.float32)
        return {"w_q4": w_q4, "scale4": scale}

    return _init_qwen2_quantized(key, cfg, dtype, to_q)


def cast_params(params: Any, dtype) -> Any:
    """Cast float leaves to `dtype`, preserving quantized linears exactly
    (int8 weights stay int8, their fp32 scales stay fp32 — blind tree-wide
    casting would dequantize 8B weights into HBM)."""

    def rec(tree):
        if isinstance(tree, dict):
            if "w_q" in tree or "w_q4" in tree:
                out = dict(tree)
                if "b" in tree:
                    out["b"] = jnp.asarray(tree["b"], dtype=dtype)
                return out
            return {k: rec(v) for k, v in tree.items()}
        return jnp.asarray(tree, dtype=dtype)

    return rec(params)


def apply_full_int8(params: dict) -> dict:
    """Full int8 serving: quantize LM weights if still dense, then enable
    dynamic activation quant on LM + vision encoder linears. Used by bench
    and the videoitg adapter so 'act8' always means the same configuration."""
    params = dict(params)
    if not ({"w_q", "w_q4"} & set(params["lm"]["layers"]["q"])):
        params["lm"] = quantize_qwen2_int8(params["lm"])
    params["lm"] = enable_act_quant(params["lm"])
    params["vision"] = enable_act_quant(
        quantize_siglip_int8(params["vision"]), keys=_SIGLIP_LINEAR_KEYS)
    return params


def apply_quantization_tier(params: dict, tier: str) -> dict:
    """One shared tier -> transform mapping for every serving entry point
    (videoitg-select --quantize, the videoitg eval adapter, bench tiers):
    'int8' = weight-only int8 LM; 'int4' = packed-nibble int4 LM;
    'act8' = int8 weights + dynamic int8 activations (LM + vision)."""
    if tier in ("int8", "act8"):
        params = quantize_grounding_int8(params)
    elif tier == "int4":
        params = dict(params)
        params["lm"] = quantize_qwen2_int4(params["lm"])
    else:
        raise ValueError(f"unknown quantization tier {tier!r}")
    if tier == "act8":
        params = apply_full_int8(params)
    return params


def quantize_grounding_int8(params: dict) -> dict:
    """Serving quantization for the full grounding model: LM linears int8;
    vision tower, projector, and scoring head stay bf16 (they are ~6% of
    bytes and the head feeds the score ordering directly)."""
    out = dict(params)
    out["lm"] = quantize_qwen2_int8(params["lm"])
    return out
