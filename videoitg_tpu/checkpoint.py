"""Checkpoint conversion and IO.

Converts HF-format VideoITG checkpoints (torch state dicts / safetensors —
the layout written by the reference's trainer, see its
eagle/model/builder.py:42-176) into this package's stacked-layer JAX pytrees,
and provides orbax-based native save/load for training.

Naming map (reference HF checkpoint -> ours):
  model.embed_tokens.weight                          lm.embed.w
  model.layers.{i}.self_attn.{q,k,v}_proj.*          lm.layers.{q,k,v} (stacked)
  model.layers.{i}.self_attn.o_proj.weight           lm.layers.o
  model.layers.{i}.mlp.{gate,up,down}_proj.weight    lm.layers.{gate,up,down}
  model.layers.{i}.input_layernorm.weight            lm.layers.input_norm
  model.layers.{i}.post_attention_layernorm.weight   lm.layers.post_attn_norm
  model.norm.weight                                  lm.final_norm
  lm_head.weight                                     lm.lm_head (VLM only)
  model.vision_tower.vision_tower.vision_model.*     vision.*
  model.mm_projector.out_projection.{0,2}.*          projector.{fc1,fc2}
  out_proj.*                                         out_proj

All torch Linear weights [out, in] are transposed to [in, out]; the SigLIP
patch-embedding conv kernel [O, C, kh, kw] becomes a [kh*kw*C, O] matmul
weight matching models/siglip._patchify ordering.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

from videoitg_tpu.config import GroundingConfig, LMConfig, VisionConfig
from videoitg_tpu.models.common import stack_layer_params


def _np(t) -> np.ndarray:
    """torch tensor / numpy array -> numpy (upcast to fp32 from bf16/fp16)."""
    if hasattr(t, "detach"):
        t = t.detach()
        if str(t.dtype) == "torch.bfloat16":
            t = t.float()
        t = t.cpu().numpy()
    t = np.asarray(t)
    if t.dtype == np.float16:
        t = t.astype(np.float32)
    return t


def _lin(sd: Mapping, prefix: str, dtype) -> dict:
    p = {"w": jnp.asarray(_np(sd[prefix + ".weight"]).T, dtype=dtype)}
    if prefix + ".bias" in sd:
        p["b"] = jnp.asarray(_np(sd[prefix + ".bias"]), dtype=dtype)
    return p


def convert_qwen2(
    sd: Mapping, cfg: LMConfig, dtype=jnp.float32, prefix: str = "", with_lm_head: bool = False
) -> dict:
    """HF Qwen2Model state dict -> qwen2 params. `prefix` locates the
    decoder (e.g. "model." inside a ForCausalLM checkpoint)."""

    def layer(i: int) -> dict:
        lp = f"{prefix}layers.{i}."
        return {
            "input_norm": {"scale": jnp.asarray(_np(sd[lp + "input_layernorm.weight"]), dtype=dtype)},
            "post_attn_norm": {
                "scale": jnp.asarray(_np(sd[lp + "post_attention_layernorm.weight"]), dtype=dtype)
            },
            "q": _lin(sd, lp + "self_attn.q_proj", dtype),
            "k": _lin(sd, lp + "self_attn.k_proj", dtype),
            "v": _lin(sd, lp + "self_attn.v_proj", dtype),
            "o": _lin(sd, lp + "self_attn.o_proj", dtype),
            "gate": _lin(sd, lp + "mlp.gate_proj", dtype),
            "up": _lin(sd, lp + "mlp.up_proj", dtype),
            "down": _lin(sd, lp + "mlp.down_proj", dtype),
        }

    params = {
        "embed": {"w": jnp.asarray(_np(sd[prefix + "embed_tokens.weight"]), dtype=dtype)},
        "layers": stack_layer_params([layer(i) for i in range(cfg.num_layers)]),
        "final_norm": {"scale": jnp.asarray(_np(sd[prefix + "norm.weight"]), dtype=dtype)},
    }
    if with_lm_head:
        head_key = "lm_head"
        if head_key + ".weight" in sd and not cfg.tie_word_embeddings:
            params["lm_head"] = _lin(sd, head_key, dtype)
    return params


def convert_siglip(sd: Mapping, cfg: VisionConfig, dtype=jnp.float32, prefix: str = "") -> dict:
    """HF SiglipVisionModel state dict -> siglip params. `prefix` locates
    vision_model (e.g. "vision_model." for a bare tower)."""

    def ln(name: str) -> dict:
        return {
            "scale": jnp.asarray(_np(sd[name + ".weight"]), dtype=dtype),
            "bias": jnp.asarray(_np(sd[name + ".bias"]), dtype=dtype),
        }

    def layer(i: int) -> dict:
        lp = f"{prefix}encoder.layers.{i}."
        return {
            "ln1": ln(lp + "layer_norm1"),
            "ln2": ln(lp + "layer_norm2"),
            "q": _lin(sd, lp + "self_attn.q_proj", dtype),
            "k": _lin(sd, lp + "self_attn.k_proj", dtype),
            "v": _lin(sd, lp + "self_attn.v_proj", dtype),
            "o": _lin(sd, lp + "self_attn.out_proj", dtype),
            "fc1": _lin(sd, lp + "mlp.fc1", dtype),
            "fc2": _lin(sd, lp + "mlp.fc2", dtype),
        }

    # Conv kernel [O, C, kh, kw] -> [kh, kw, C, O] -> [kh*kw*C, O]
    conv_w = _np(sd[prefix + "embeddings.patch_embedding.weight"])
    o, c, kh, kw = conv_w.shape
    patch_w = conv_w.transpose(2, 3, 1, 0).reshape(kh * kw * c, o)

    patch_embed = {"w": jnp.asarray(patch_w, dtype=dtype)}
    if prefix + "embeddings.patch_embedding.bias" in sd:  # SigLIP has bias, CLIP not
        patch_embed["b"] = jnp.asarray(
            _np(sd[prefix + "embeddings.patch_embedding.bias"]), dtype=dtype)

    params = {
        "patch_embed": patch_embed,
        "pos_embed": jnp.asarray(
            _np(sd[prefix + "embeddings.position_embedding.weight"]), dtype=dtype
        ),
        "layers": stack_layer_params([layer(i) for i in range(cfg.num_layers)]),
    }
    if cfg.arch == "clip":
        params["cls_embed"] = jnp.asarray(
            _np(sd[prefix + "embeddings.class_embedding"]), dtype=dtype)
        # HF CLIP spells it "pre_layrnorm" (sic).
        params["pre_ln"] = ln(prefix + "pre_layrnorm")
    return params


def convert_projector(sd: Mapping, dtype=jnp.float32, prefix: str = "",
                      projector_type: str = "seq_mlp") -> dict:
    """Projector weights per family (reference builder.py:48-69 layouts):
    seq_mlp = out_projection.{0,2}; linear = a bare nn.Linear; mlpNx_gelu =
    nn.Sequential indices 0, 2, 4...; identity = no params."""
    if projector_type == "seq_mlp":
        return {
            "fc1": _lin(sd, prefix + "out_projection.0", dtype),
            "fc2": _lin(sd, prefix + "out_projection.2", dtype),
        }
    if projector_type == "identity":
        return {}
    if projector_type == "linear":
        return {"fc1": _lin(sd, prefix.rstrip("."), dtype)}
    m = re.fullmatch(r"mlp(\d+)x_gelu", projector_type)
    if not m:
        raise ValueError(f"unknown projector type {projector_type!r}")
    return {
        f"fc{i + 1}": _lin(sd, prefix + str(2 * i), dtype)
        for i in range(int(m.group(1)))
    }


def convert_grounding_checkpoint(sd: Mapping, cfg: GroundingConfig, dtype=jnp.float32) -> dict:
    """Full EagleQwenG HF checkpoint -> grounding params pytree."""
    return {
        "lm": convert_qwen2(sd, cfg.lm, dtype=dtype, prefix="model."),
        "vision": convert_siglip(
            sd, cfg.vision, dtype=dtype, prefix="model.vision_tower.vision_tower.vision_model."
        ),
        "projector": convert_projector(
            sd, dtype=dtype, prefix="model.mm_projector.",
            projector_type=cfg.projector.projector_type),
        "out_proj": _lin(sd, "out_proj", dtype),
    }


def convert_vlm_checkpoint(sd: Mapping, cfg: GroundingConfig, dtype=jnp.float32) -> dict:
    """Causal Eagle-style VLM checkpoint (EagleQwenForCausalLM layout) ->
    vlm params pytree (lm_head instead of out_proj)."""
    return {
        "lm": convert_qwen2(sd, cfg.lm, dtype=dtype, prefix="model.",
                            with_lm_head=True),
        "vision": convert_siglip(
            sd, cfg.vision, dtype=dtype, prefix="model.vision_tower.vision_tower.vision_model."
        ),
        "projector": convert_projector(
            sd, dtype=dtype, prefix="model.mm_projector.",
            projector_type=cfg.projector.projector_type),
    }


def load_hf_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    """Read all *.safetensors (or pytorch_model*.bin) in an HF model dir."""
    sd: Dict[str, np.ndarray] = {}
    st_files = sorted(
        f for f in os.listdir(model_dir) if re.fullmatch(r".*\.safetensors", f)
    )
    if st_files:
        from safetensors import safe_open

        for fname in st_files:
            with safe_open(os.path.join(model_dir, fname), framework="np") as f:
                for k in f.keys():
                    sd[k] = f.get_tensor(k)
        return sd
    bin_files = sorted(f for f in os.listdir(model_dir) if f.endswith(".bin"))
    if bin_files:
        import torch

        for fname in bin_files:
            part = torch.load(
                os.path.join(model_dir, fname), map_location="cpu", weights_only=True
            )
            sd.update(part)
        return sd
    raise FileNotFoundError(f"no safetensors/bin weights under {model_dir}")


def load_grounding_model(model_dir: str, cfg: GroundingConfig | None = None, dtype=jnp.bfloat16):
    """Load an HF-format VideoITG checkpoint directory -> (params, cfg).

    Config resolution: explicit cfg arg > a videoitg_tpu_config.json in the
    checkpoint dir (self-describing checkpoints, the convention every
    in-tree exporter follows) > the videoitg-8b flagship default.
    """
    if cfg is None:
        cfg_path = os.path.join(model_dir, "videoitg_tpu_config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                cfg = GroundingConfig.from_json(f.read())
        else:
            cfg = GroundingConfig.videoitg_8b()
    sd = load_hf_state_dict(model_dir)
    return convert_grounding_checkpoint(sd, cfg, dtype=dtype), cfg


# ---- HF-format export (interop with the torch reference stack) ----


def export_grounding_state_dict(params: dict, cfg: GroundingConfig) -> Dict[str, np.ndarray]:
    """Grounding params pytree -> reference-layout HF state dict (fp32/bf16
    numpy). Inverse of convert_grounding_checkpoint; lets TPU-trained
    checkpoints load into the torch EagleQwenG stack (its builder.py:42)."""

    sd: Dict[str, np.ndarray] = {}

    def put_lin(prefix: str, lin: dict):
        if "w_q" in lin:
            raise ValueError(f"{prefix}: export requires unquantized weights")
        sd[prefix + ".weight"] = np.asarray(lin["w"], dtype=np.float32).T
        if "b" in lin:
            sd[prefix + ".bias"] = np.asarray(lin["b"], dtype=np.float32)

    lm = params["lm"]
    sd["model.embed_tokens.weight"] = np.asarray(lm["embed"]["w"], dtype=np.float32)
    sd["model.norm.weight"] = np.asarray(lm["final_norm"]["scale"], dtype=np.float32)
    n_layers = cfg.lm.num_layers
    for i in range(n_layers):
        lp = jax_tree_index(lm["layers"], i)
        base = f"model.layers.{i}."
        sd[base + "input_layernorm.weight"] = np.asarray(lp["input_norm"]["scale"], np.float32)
        sd[base + "post_attention_layernorm.weight"] = np.asarray(
            lp["post_attn_norm"]["scale"], np.float32)
        put_lin(base + "self_attn.q_proj", lp["q"])
        put_lin(base + "self_attn.k_proj", lp["k"])
        put_lin(base + "self_attn.v_proj", lp["v"])
        put_lin(base + "self_attn.o_proj", lp["o"])
        put_lin(base + "mlp.gate_proj", lp["gate"])
        put_lin(base + "mlp.up_proj", lp["up"])
        put_lin(base + "mlp.down_proj", lp["down"])

    vision = params["vision"]
    vp = "model.vision_tower.vision_tower.vision_model."
    patch_w = np.asarray(vision["patch_embed"]["w"], np.float32)  # [kh*kw*C, O]
    p = cfg.vision.patch_size
    o = patch_w.shape[1]
    sd[vp + "embeddings.patch_embedding.weight"] = (
        patch_w.reshape(p, p, 3, o).transpose(3, 2, 0, 1))
    if "b" in vision["patch_embed"]:  # SigLIP; CLIP's conv is biasless
        sd[vp + "embeddings.patch_embedding.bias"] = np.asarray(
            vision["patch_embed"]["b"], np.float32)
    sd[vp + "embeddings.position_embedding.weight"] = np.asarray(
        vision["pos_embed"], np.float32)
    if cfg.vision.arch == "clip":
        sd[vp + "embeddings.class_embedding"] = np.asarray(
            vision["cls_embed"], np.float32)
        sd[vp + "pre_layrnorm.weight"] = np.asarray(
            vision["pre_ln"]["scale"], np.float32)
        sd[vp + "pre_layrnorm.bias"] = np.asarray(
            vision["pre_ln"]["bias"], np.float32)
    for i in range(cfg.vision.num_layers):
        lp = jax_tree_index(vision["layers"], i)
        base = vp + f"encoder.layers.{i}."
        for ours, theirs in [("ln1", "layer_norm1"), ("ln2", "layer_norm2")]:
            sd[base + theirs + ".weight"] = np.asarray(lp[ours]["scale"], np.float32)
            sd[base + theirs + ".bias"] = np.asarray(lp[ours]["bias"], np.float32)
        put_lin(base + "self_attn.q_proj", lp["q"])
        put_lin(base + "self_attn.k_proj", lp["k"])
        put_lin(base + "self_attn.v_proj", lp["v"])
        put_lin(base + "self_attn.out_proj", lp["o"])
        put_lin(base + "mlp.fc1", lp["fc1"])
        put_lin(base + "mlp.fc2", lp["fc2"])

    ptype = cfg.projector.projector_type
    if ptype == "seq_mlp":
        put_lin("model.mm_projector.out_projection.0", params["projector"]["fc1"])
        put_lin("model.mm_projector.out_projection.2", params["projector"]["fc2"])
    elif ptype == "linear":
        put_lin("model.mm_projector", params["projector"]["fc1"])
    elif ptype != "identity":  # mlpNx_gelu: Sequential indices 0, 2, 4...
        names = sorted(params["projector"], key=lambda k: int(k[2:]))
        for i, name in enumerate(names):
            put_lin(f"model.mm_projector.{2 * i}", params["projector"][name])
    put_lin("out_proj", params["out_proj"])
    return sd


def jax_tree_index(stacked: dict, i: int) -> dict:
    import jax

    return jax.tree.map(lambda x: x[i], stacked)


def save_hf_checkpoint(params: dict, cfg: GroundingConfig, out_dir: str,
                       projector_only: bool = False) -> str:
    """Write reference-compatible safetensors (+config.json).

    projector_only mirrors the reference's adapter-save mode
    (train_itg.py:273-295 writes mm_projector.bin only).
    """
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    sd = export_grounding_state_dict(params, cfg)
    if projector_only:
        sd = {k: v for k, v in sd.items()
              if k.startswith("model.mm_projector.") or k.startswith("out_proj")}
        path = os.path.join(out_dir, "mm_projector.safetensors")
    else:
        path = os.path.join(out_dir, "model.safetensors")
    save_file(sd, path)
    with open(os.path.join(out_dir, "videoitg_tpu_config.json"), "w") as f:
        f.write(cfg.to_json())
    return path


# ---- native (orbax) checkpointing for training ----


def save_orbax(path: str, params, step: int | None = None) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, f"step_{step}" if step is not None else "params"), params)


def restore_orbax(path: str, template):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), template)


# ---- serving checkpoints (pre-quantized, fast cold start) ----------------


SERVING_CONFIG_NAME = "serving_config.json"


def save_serving_checkpoint(params: dict, cfg: GroundingConfig, out_dir: str,
                            quantize: str | None = None,
                            tokenizer_dir: str | None = None) -> str:
    """Persist a ready-to-serve params tree (int8/int4 leaves included).

    The HF->JAX->quantize path costs a full bf16 materialization plus the
    quantization pass at every cold start; a serving checkpoint does that
    once and stores the result (the reference has no counterpart — its
    bitsandbytes quantization always re-runs at load, builder.py:48-57).
    Layout: `serving_config.json` (model config + quantization tier) +
    an orbax `params/` tree.
    """
    import json as _json

    out_dir = os.path.abspath(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, SERVING_CONFIG_NAME), "w") as f:
        _json.dump({"format": "videoitg-serving-v1",
                    "quantize": quantize,
                    "config": _json.loads(cfg.to_json())}, f, indent=2)
    if tokenizer_dir:
        # Carry the tokenizer so the serving dir is self-contained
        # (AutoTokenizer.from_pretrained loads straight from it).
        import glob as _glob
        import shutil as _shutil

        for pat in ("tokenizer*", "special_tokens_map.json", "vocab*",
                    "merges.txt"):
            for f in _glob.glob(os.path.join(tokenizer_dir, pat)):
                _shutil.copy(f, out_dir)
    save_orbax(out_dir, params)
    return out_dir


def is_serving_checkpoint(model_dir: str) -> bool:
    return os.path.exists(os.path.join(model_dir, SERVING_CONFIG_NAME))


def load_serving_checkpoint(model_dir: str):
    """(params, cfg, quantize_tier) from a save_serving_checkpoint dir."""
    import json as _json

    import orbax.checkpoint as ocp

    with open(os.path.join(model_dir, SERVING_CONFIG_NAME)) as f:
        meta = _json.load(f)
    cfg = GroundingConfig.from_json(_json.dumps(meta["config"]))
    with ocp.StandardCheckpointer() as ckptr:
        params = ckptr.restore(
            os.path.join(os.path.abspath(model_dir), "params"))
    return params, cfg, meta.get("quantize")
