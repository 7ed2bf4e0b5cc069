"""Parameter partition specs for the grounding model.

Tensor-parallel layout (Megatron-style, expressed as GSPMD annotations —
the TPU-native replacement for the reference's ZeRO stages and its manual
layer->GPU device maps, internvl2.py:143-181):

  * attention: q/k/v output features sharded over tp (head-aligned: 28 q and
    4 kv heads both divide tp in {1,2,4}), o_proj input sharded -> the
    all-reduce after o_proj is the layer's only attention collective.
  * MLP: gate/up output sharded, down input sharded (same single all-reduce).
  * embeddings: vocab dim sharded (gather stays local-heavy).
  * norms / head: replicated (tiny).

The same tree doubles as FSDP-style storage sharding: every large leaf lives
split across chips, so 8B bf16 params occupy ~16GB/tp_size per chip.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from videoitg_tpu.parallel.mesh import PP_AXIS, TP_AXIS


def qwen2_param_specs(pp: bool = False) -> dict:
    """PartitionSpecs mirroring models/qwen2 param tree (stacked layers).

    pp=True additionally shards the stacked-layer (leading) axis over the
    mesh's pp axis — each pipeline stage stores only its own layers
    (parallel/pipeline.py); composes with the tp column/row specs.
    """
    t = TP_AXIS
    s0 = PP_AXIS if pp else None
    return {
        "embed": {"w": P(t, None)},
        "layers": {
            "input_norm": {"scale": P(s0, None)},
            "post_attn_norm": {"scale": P(s0, None)},
            "q": {"w": P(s0, None, t), "b": P(s0, t)},
            "k": {"w": P(s0, None, t), "b": P(s0, t)},
            "v": {"w": P(s0, None, t), "b": P(s0, t)},
            "o": {"w": P(s0, t, None)},
            "gate": {"w": P(s0, None, t)},
            "up": {"w": P(s0, None, t)},
            "down": {"w": P(s0, t, None)},
        },
        "final_norm": {"scale": P(None)},
    }


def siglip_param_specs() -> dict:
    t = TP_AXIS
    layer = {
        "ln1": {"scale": P(None, None), "bias": P(None, None)},
        "ln2": {"scale": P(None, None), "bias": P(None, None)},
        "q": {"w": P(None, None, t), "b": P(None, t)},
        "k": {"w": P(None, None, t), "b": P(None, t)},
        "v": {"w": P(None, None, t), "b": P(None, t)},
        "o": {"w": P(None, t, None), "b": P(None, None)},
        "fc1": {"w": P(None, None, t), "b": P(None, t)},
        "fc2": {"w": P(None, t, None), "b": P(None, None)},
    }
    return {
        "patch_embed": {"w": P(None, t), "b": P(t)},
        "pos_embed": P(None, None),
        "layers": layer,
    }


def grounding_param_specs(with_lm_head: bool = False, pp: bool = False) -> dict:
    t = TP_AXIS
    specs = {
        "vision": siglip_param_specs(),
        "projector": {
            "fc1": {"w": P(None, t), "b": P(t)},
            "fc2": {"w": P(t, None), "b": P(None)},
        },
        "lm": qwen2_param_specs(pp=pp),
        "out_proj": {"w": P(None, None), "b": P(None)},
    }
    if with_lm_head:
        specs["lm"]["lm_head"] = {"w": P(None, t)}
    return specs


def adapt_specs_to_params(specs: Any, params: Any) -> Any:
    """Rewrite a dense spec tree so it matches a quantized / LoRA param tree.

    int8 serving replaces a linear's {'w'} with {'w_q', 'scale'} (ops/quant):
    `w_q` inherits `w`'s spec; the per-output-channel `scale` keeps the
    stacked-layer axes plus `w`'s output axis (so a column-parallel linear
    shards its scales on the same tp axis as its int8 columns, and a
    row-parallel linear replicates them). `act_q` markers (value None) pass
    through as empty subtrees. LoRA leaves are tiny and stay replicated —
    storage placement only; GSPMD still shards the compute. This is what
    removes the reference's quantized-vs-distributed exclusivity (its
    bitsandbytes path is single-process, builder.py:48-57).
    """

    def rec(spec, param):
        if isinstance(param, dict):
            if "w_q" in param or "w_q4" in param:
                w_spec = spec["w"]
                scale_spec = P(*(tuple(w_spec)[:-2] + tuple(w_spec)[-1:]))
                if "w_q" in param:
                    out = {"w_q": w_spec, "scale": scale_spec}
                else:
                    # packed int4: the in-axis is halved but its sharding
                    # axis is unchanged (nibble planes split the same way)
                    out = {"w_q4": w_spec, "scale4": scale_spec}
                if "b" in param:
                    out["b"] = spec.get("b", scale_spec)
                if "act_q" in param:
                    out["act_q"] = None
                for k in ("lora_a", "lora_b", "lora_scale"):
                    if k in param:  # QLoRA: adapters over a quantized base
                        out[k] = P()
                return out
            out = {}
            for k, v in param.items():
                if k in ("lora_a", "lora_b", "lora_scale"):
                    out[k] = P()  # replicate adapters (tiny)
                else:
                    out[k] = rec(spec[k], v)
            return out
        return spec

    return rec(specs, params)


def named_shardings(specs: Any, mesh: Mesh) -> Any:
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params: Any, specs: Any, mesh: Mesh) -> Any:
    """Place a param pytree onto the mesh according to specs."""
    shardings = named_shardings(specs, mesh)
    return jax.tree.map(jax.device_put, params, shardings)
