"""LoRA adapters for the LM (reference train_itg.py:1252-1268 peft option).

Functional formulation: a target linear's param dict gains lora_a [in, r],
lora_b [r, out], lora_scale [] leaves; models/common.linear applies
y += (x @ a) @ b * scale transparently. Training freezes everything except
lora_* leaves (and optionally the scoring head); merge_lora folds adapters
back into dense weights for serving/export.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import optax

DEFAULT_TARGETS = ("q", "k", "v", "o", "gate", "up", "down")


def add_lora(
    params: dict,
    key,
    rank: int = 16,
    alpha: float = 32.0,
    targets: Sequence[str] = DEFAULT_TARGETS,
    dtype=jnp.float32,
) -> dict:
    """Return params with LoRA leaves added to LM decoder-layer linears.

    Works on dense AND quantized bases (QLoRA — the reference's peft +
    bitsandbytes 4/8-bit path, train_itg.py:1213-1268): adapters train in
    float while the frozen base stays int8/int4."""
    out = dict(params)
    lm = dict(params["lm"])
    layers = dict(lm["layers"])
    keys = jax.random.split(key, len(targets))
    for k_i, name in zip(keys, targets):
        lin = dict(layers[name])
        if "w" in lin:
            n_layers, d_in, d_out = lin["w"].shape
        elif "w_q" in lin:
            n_layers, d_in, d_out = lin["w_q"].shape
        else:  # packed int4: the in-axis holds two nibbles per byte
            n_layers, d_half, d_out = lin["w_q4"].shape
            d_in = d_half * 2
        # Kaiming-ish init for A, zeros for B (standard LoRA).
        lin["lora_a"] = (
            jax.random.normal(k_i, (n_layers, d_in, rank), jnp.float32) * (d_in ** -0.5)
        ).astype(dtype)
        lin["lora_b"] = jnp.zeros((n_layers, rank, d_out), dtype=dtype)
        lin["lora_scale"] = jnp.full((n_layers,), alpha / rank, dtype=jnp.float32)
        layers[name] = lin
    lm["layers"] = layers
    out["lm"] = lm
    return out


def merge_lora(params: dict) -> dict:
    """Fold LoRA deltas into dense weights and strip adapter leaves."""

    def merge_tree(tree):
        if isinstance(tree, dict) and "lora_a" in tree:
            if "w" not in tree:
                raise ValueError(
                    "cannot fold LoRA into a quantized base (no dense 'w'); "
                    "dequantize first or serve base+adapters unmerged"
                )
            lin = dict(tree)
            delta = jnp.einsum(
                "lir,lro->lio", lin["lora_a"].astype(jnp.float32),
                lin["lora_b"].astype(jnp.float32),
            ) * lin["lora_scale"][:, None, None]
            lin["w"] = (lin["w"].astype(jnp.float32) + delta).astype(lin["w"].dtype)
            for k in ("lora_a", "lora_b", "lora_scale"):
                del lin[k]
            return lin
        if isinstance(tree, dict):
            return {k: merge_tree(v) for k, v in tree.items()}
        return tree

    return merge_tree(params)


def make_lora_optimizer(
    params: dict,
    learning_rate: float = 2e-4,
    out_proj_lr: float | None = None,
    total_steps: int = 10_000,
    warmup_ratio: float = 0.05,
    schedule: str = "cosine",
    weight_decay: float = 0.0,
    max_grad_norm: float | None = 1.0,
    accum_steps: int = 1,
) -> optax.GradientTransformation:
    """Train only lora_* leaves (+ the scoring head when out_proj_lr set).

    Gradient clipping and accumulation compose exactly like
    make_grounding_optimizer's — the CLI's --max-grad-norm /
    --gradient-accumulation-steps apply to LoRA runs too.
    """
    from videoitg_tpu.train.optimizer import make_schedule

    def label_leaf(path, _leaf) -> str:
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if any(str(k).startswith("lora_") for k in keys):
            return "lora"
        if out_proj_lr is not None and "out_proj" in [str(k) for k in keys]:
            return "out_proj"
        return "frozen"

    labels = jax.tree_util.tree_map_with_path(label_leaf, params)

    def adamw(lr):
        chain = [optax.adamw(make_schedule(lr, total_steps, warmup_ratio, schedule),
                             weight_decay=weight_decay)]
        if max_grad_norm is not None:
            chain.insert(0, optax.clip_by_global_norm(max_grad_norm))
        return optax.chain(*chain)

    tx = optax.multi_transform(
        {
            "lora": adamw(learning_rate),
            "out_proj": adamw(out_proj_lr if out_proj_lr is not None else learning_rate),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx
