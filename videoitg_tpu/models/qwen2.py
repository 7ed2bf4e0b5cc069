"""Qwen2-style decoder LM in functional JAX.

Behavior contract: HF Qwen2-7B (hidden 3584, 28 layers, 28 q / 4 kv heads,
SwiGLU 18944, RMSNorm eps 1e-6, rope theta 1e6, q/k/v bias, o/mlp no bias).
The grounding variant runs every layer with **non-causal** attention and no
KV cache (reference eagle/model/language_model/grounding_qwen2.py:45-48,
:141 use_cache=False); the VLM variant is causal.

This module consumes pre-computed input embeddings (the multimodal splice
happens upstream in models/grounding.py) — mirroring the reference call
`self.model(inputs_embeds=...)` — plus explicit position ids so packed
static layouts keep reference-identical RoPE phases.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from videoitg_tpu.config import LMConfig
from videoitg_tpu.models.common import (
    apply_rope,
    fused_qkv,
    init_linear,
    linear,
    rms_norm,
    slice_layer_params,
    stack_layer_params,
)
from videoitg_tpu.ops.attention import mha


def init_qwen2(key, cfg: LMConfig, dtype=jnp.float32, with_lm_head: bool = False) -> dict:
    keys = jax.random.split(key, cfg.num_layers + 3)
    h = cfg.hidden_size

    def init_layer(k):
        ks = jax.random.split(k, 7)
        return {
            "input_norm": {"scale": jnp.ones((h,), dtype)},
            "post_attn_norm": {"scale": jnp.ones((h,), dtype)},
            "q": init_linear(ks[0], h, cfg.q_dim, bias=cfg.qkv_bias, dtype=dtype),
            "k": init_linear(ks[1], h, cfg.kv_dim, bias=cfg.qkv_bias, dtype=dtype),
            "v": init_linear(ks[2], h, cfg.kv_dim, bias=cfg.qkv_bias, dtype=dtype),
            "o": init_linear(ks[3], cfg.q_dim, h, bias=False, dtype=dtype),
            "gate": init_linear(ks[4], h, cfg.intermediate_size, bias=False, dtype=dtype),
            "up": init_linear(ks[5], h, cfg.intermediate_size, bias=False, dtype=dtype),
            "down": init_linear(ks[6], cfg.intermediate_size, h, bias=False, dtype=dtype),
        }

    params = {
        "embed": {
            "w": (jax.random.normal(keys[0], (cfg.vocab_size, h), jnp.float32) * 0.02).astype(dtype)
        },
        "layers": stack_layer_params([init_layer(keys[1 + i]) for i in range(cfg.num_layers)]),
        "final_norm": {"scale": jnp.ones((h,), dtype)},
    }
    if with_lm_head and not cfg.tie_word_embeddings:
        params["lm_head"] = init_linear(keys[-1], h, cfg.vocab_size, bias=False, dtype=dtype)
    return params


def embed_tokens(params: dict, ids: jax.Array) -> jax.Array:
    """Token embedding lookup; ids may contain padding (callers mask)."""
    return params["embed"]["w"][ids]


def _decoder_layer(
    layer_params: dict,
    x: jax.Array,
    positions: jax.Array,
    valid: Optional[jax.Array],
    cfg: LMConfig,
    use_flash: bool,
) -> jax.Array:
    b, s, h = x.shape
    residual = x
    y = rms_norm(layer_params["input_norm"], x, cfg.rms_norm_eps)

    q, k, v = fused_qkv(layer_params["q"], layer_params["k"], layer_params["v"], y)
    q = q.reshape(b, s, cfg.num_heads, cfg.head_dim)
    k = k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
    v = v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
    q, k, v = (a.transpose(0, 2, 1, 3) for a in (q, k, v))
    q = apply_rope(q, positions, cfg.rope_theta)
    k = apply_rope(k, positions, cfg.rope_theta)

    attn = mha(q, k, v, valid=valid, causal=cfg.causal, use_flash=use_flash)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, cfg.q_dim)
    x = residual + linear(layer_params["o"], attn)

    residual = x
    y = rms_norm(layer_params["post_attn_norm"], x, cfg.rms_norm_eps)
    y = linear(
        layer_params["down"],
        jax.nn.silu(linear(layer_params["gate"], y)) * linear(layer_params["up"], y),
    )
    return residual + y


def qwen2_hidden_states(
    params: dict,
    inputs_embeds: jax.Array,
    positions: jax.Array,
    valid: Optional[jax.Array],
    cfg: LMConfig,
    use_flash: bool = False,
    remat: bool = False,
) -> jax.Array:
    """Run the decoder stack; returns final-norm hidden states [B, S, H].

    Under an active pipeline context (parallel/context.pipeline_mesh) the
    stack runs as a microbatched GPipe pipeline over the mesh's pp axis
    instead of the local scan (parallel/pipeline.py).
    """
    from videoitg_tpu.parallel import context as par_context

    pctx = par_context.current_pipeline()
    if pctx is not None and pctx[0].shape[pctx[1]] > 1:
        from videoitg_tpu.parallel.pipeline import pipeline_hidden_states

        mesh, pp_axis, microbatches = pctx
        return pipeline_hidden_states(
            params, inputs_embeds, positions, valid, cfg,
            use_flash=use_flash, remat=remat, mesh=mesh, pp_axis=pp_axis,
            microbatches=microbatches)

    x = inputs_embeds
    layers = slice_layer_params(params["layers"], cfg.num_layers)

    layer_fn = _decoder_layer
    if remat:
        layer_fn = jax.checkpoint(
            _decoder_layer, static_argnums=(4, 5), policy=jax.checkpoint_policies.nothing_saveable
        )

    def body(carry, layer_params):
        return layer_fn(layer_params, carry, positions, valid, cfg, use_flash), None

    x, _ = jax.lax.scan(body, x, layers)
    return rms_norm(params["final_norm"], x, cfg.rms_norm_eps)


def lm_logits(params: dict, hidden: jax.Array, cfg: LMConfig) -> jax.Array:
    """LM head for the causal VLM variant (fp32 logits)."""
    if cfg.tie_word_embeddings:
        w = params["embed"]["w"].T
        return jnp.einsum("bsh,hv->bsv", hidden, w, preferred_element_type=jnp.float32)
    return jnp.einsum(
        "bsh,hv->bsv", hidden, params["lm_head"]["w"], preferred_element_type=jnp.float32
    )
