"""Optimizer with per-subtree learning-rate groups.

Parity targets (reference eagle/train/eagle_trainer.py:167-248 +
finetune-qwen2-7b-grounding.sh): AdamW, base lr 2e-5, separate group for
the scoring head (`out_proj_lr` 2e-4), optional separate group for the
projector (`mm_projector_lr`), frozen vision tower, cosine schedule with
warmup_ratio 0.05, weight_decay 0. Implemented as optax.multi_transform
over subtree labels — the TPU-native replacement for HF Trainer param
groups + DeepSpeed fused AdamW.
"""

from __future__ import annotations

from typing import Optional

import jax
import optax


def _label_tree(params) -> dict:
    """Map each grounding-param leaf to its optimizer group.

    Quantized base weights (w_q / w_q4 and their scales) are always frozen
    regardless of their subtree — training updates int8 bytes makes no
    sense, and with allow_int grads they arrive as float0 anyway; LoRA
    leaves inside a quantized linear still train at the subtree's rate."""

    def subtree(tree, label):
        if isinstance(tree, dict):
            if "w_q" in tree or "w_q4" in tree:
                # quantized linear: base weight + its scales frozen; any
                # LoRA leaves riding in the same dict keep the group rate.
                return {
                    k: subtree(v, label if k.startswith("lora_") else "frozen")
                    for k, v in tree.items()
                }
            return {k: subtree(v, label) for k, v in tree.items()}
        return jax.tree.map(lambda _: label, tree)

    labels = {}
    for key, sub in params.items():
        if key == "out_proj":
            labels[key] = subtree(sub, "out_proj")
        elif key == "projector":
            labels[key] = subtree(sub, "projector")
        elif key == "vision":
            labels[key] = subtree(sub, "frozen")
        else:
            labels[key] = subtree(sub, "base")
    return labels


def make_schedule(
    base_lr: float, total_steps: int, warmup_ratio: float = 0.05,
    kind: str = "cosine",
) -> optax.Schedule:
    warmup = max(1, int(total_steps * warmup_ratio))
    if kind == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=base_lr, warmup_steps=warmup,
            decay_steps=max(total_steps, warmup + 1), end_value=0.0,
        )
    if kind == "constant":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base_lr, warmup),
             optax.constant_schedule(base_lr)], [warmup],
        )
    raise ValueError(f"unknown schedule {kind!r}")


def make_grounding_optimizer(
    params,
    learning_rate: float = 2e-5,
    out_proj_lr: Optional[float] = 2e-4,
    projector_lr: Optional[float] = None,
    weight_decay: float = 0.0,
    total_steps: int = 10_000,
    warmup_ratio: float = 0.05,
    schedule: str = "cosine",
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    max_grad_norm: Optional[float] = 1.0,
    accum_steps: int = 1,
    tune_projector_only: bool = False,
) -> optax.GradientTransformation:
    def adamw(lr):
        sched = make_schedule(lr, total_steps, warmup_ratio, schedule)
        chain = [optax.adamw(sched, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)]
        if max_grad_norm is not None:
            chain.insert(0, optax.clip_by_global_norm(max_grad_norm))
        return optax.chain(*chain)

    # Stage-1 projector pretrain trains ONLY the adapter (reference
    # --tune_mm_mlp_adapter True, pretrain-qwen2-7b.sh:26).
    frozen = optax.set_to_zero()
    tx = optax.multi_transform(
        {
            "base": frozen if tune_projector_only else adamw(learning_rate),
            "out_proj": frozen if tune_projector_only else adamw(
                out_proj_lr if out_proj_lr is not None else learning_rate),
            "projector": adamw(projector_lr if projector_lr is not None else learning_rate),
            "frozen": frozen,
        },
        _label_tree(params),
    )
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx
