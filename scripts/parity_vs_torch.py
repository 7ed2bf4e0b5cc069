"""Real-checkpoint Top-K parity harness: JAX stack vs torch reference semantics.

The acceptance metric of the whole rebuild (BASELINE config 1) is Top-K frame
index parity on `nvidia/VideoITG-8B`. This script makes that a one-command
check for the day the weights are reachable:

    python scripts/parity_vs_torch.py \
        --checkpoint /ckpts/VideoITG-8B --video assets/imax.mp4 \
        --prompt "Find the frames where the rocket launches."

It loads ONE HF-format checkpoint directory into BOTH stacks:

* torch side — the reference inference semantics reimplemented locally
  against HF transformers (the reference pipeline is
  /root/reference/infer.py:53-79: SigLIP hidden_states[-2] -> seq_mlp
  bilinear pool + MLP -> splice at the <image> sentinel -> Qwen2 with
  bidirectional attention (grounding_qwen2.py:45-48) -> per-frame mean-pool
  -> out_proj -> sigmoid -> descending sort -> Top-K -> ascending). No code
  is imported from the reference.
* JAX side — videoitg_tpu.checkpoint.load_hf_state_dict ->
  convert_grounding_checkpoint -> SelectionEngine.

Both consume the same decoded frames (the infer.py frame-index rounding) and
the same token ids (real AutoTokenizer from the checkpoint dir), so the
comparison isolates model numerics + preprocessing. Checks:

* Top-8 and Top-32 selected-index equality (after the downstream contract's
  "first k then ascending sort", internvl2.py:114-123),
* 2-dp score parity for every frame (the results.jsonl serialization
  precision, videoitg.py:308).

`--selftest` proves the harness end-to-end today: it synthesizes a tiny
full-layout EagleQwenG checkpoint with torch-authored HF modules (real
safetensors + real tokenizer.json loaded via AutoTokenizer), a real test
video, and runs the exact code path real weights will take.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

import numpy as np

IMAGE_TOKEN_INDEX = -200  # reference eagle/constants.py


# --------------------------------------------------------------------------
# torch oracle (reference semantics, HF transformers building blocks)
# --------------------------------------------------------------------------


def _torch_tensors(sd, prefix: str):
    import torch

    out = {}
    for k, v in sd.items():
        if k.startswith(prefix):
            t = torch.as_tensor(np.asarray(v))
            if t.dtype in (torch.float16, torch.bfloat16):
                t = t.float()
            out[k[len(prefix):]] = t
    return out


def _hf_vision_config(cfg, **kwargs):
    from transformers import SiglipVisionConfig

    return SiglipVisionConfig(**kwargs,
        hidden_size=cfg.vision.hidden_size,
        intermediate_size=cfg.vision.intermediate_size,
        num_hidden_layers=cfg.vision.num_layers,
        num_attention_heads=cfg.vision.num_heads,
        image_size=cfg.vision.image_size,
        patch_size=cfg.vision.patch_size,
        layer_norm_eps=cfg.vision.layer_norm_eps,
        hidden_act="gelu_pytorch_tanh",
    )


def _hf_lm_config(cfg, **kwargs):
    from transformers import Qwen2Config

    return Qwen2Config(**kwargs,
        vocab_size=cfg.lm.vocab_size,
        hidden_size=cfg.lm.hidden_size,
        intermediate_size=cfg.lm.intermediate_size,
        num_hidden_layers=cfg.lm.num_layers,
        num_attention_heads=cfg.lm.num_heads,
        num_key_value_heads=cfg.lm.num_kv_heads,
        head_dim=cfg.lm.head_dim,
        rms_norm_eps=cfg.lm.rms_norm_eps,
        rope_theta=cfg.lm.rope_theta,
    )


def build_torch_stack(sd, cfg, attn: str = "eager"):
    """(vision_model, qwen2_model) HF modules loaded from the checkpoint.

    attn="eager" materializes [H, S, S] weights — exact but O(S^2) memory;
    attn="sdpa" runs torch's flash CPU kernel non-causally (O(S) memory),
    the same semantic the reference gets from flash-attn with
    is_causal=False (grounding_qwen2.py:45-48) — required for the 8B
    geometry's ~16k-token sequence on a 125 GB host.
    """
    import torch
    from transformers import Qwen2Model, SiglipVisionModel

    # attn_implementation must go through the constructor: transformers
    # reads _attn_implementation, and a post-hoc attribute set is ignored.
    vision = SiglipVisionModel(
        _hf_vision_config(cfg, attn_implementation=attn)).eval()
    vsd = _torch_tensors(sd, "model.vision_tower.vision_tower.")
    missing, unexpected = vision.load_state_dict(vsd, strict=False)
    # The grounding checkpoint selects hidden_states[-2]: the attention-pool
    # head (and possibly the last layer + post-LN) may be absent — fine.
    real_missing = [k for k in missing if ".head." not in k and "post_layernorm" not in k]
    assert not real_missing and not unexpected, (real_missing, unexpected)

    lm = Qwen2Model(_hf_lm_config(cfg, attn_implementation=attn,
                                  use_cache=False)).eval()
    lsd = {
        k[len("model."):]: torch.as_tensor(np.asarray(v)).float()
        for k, v in sd.items()
        if k.startswith("model.")
        and not k.startswith("model.vision_tower.")
        and not k.startswith("model.mm_projector.")
    }
    lm.load_state_dict(lsd, strict=True)
    if attn == "sdpa":
        # Bidirectional attention, the flash way: no mask tensor at all plus
        # a non-causal flag per layer (verified == eager + zero mask).
        for layer in lm.layers:
            layer.self_attn.is_causal = False
    return vision, lm


def torch_seq_mlp(sd, feats, hw: int):
    """seq_mlp projector semantics (reference mlp_proj.py:39-75)."""
    import torch
    import torch.nn.functional as F

    t, p, c = feats.shape
    ori = int(math.isqrt(p))
    if hw < ori:
        x = feats.view(t, ori, ori, c).permute(0, 3, 1, 2)
        x = F.interpolate(x, size=(hw, hw), mode="bilinear", align_corners=False)
        x = x.permute(0, 2, 3, 1).reshape(t, hw * hw, c)
    else:
        x = feats
    w1 = torch.as_tensor(np.asarray(sd["model.mm_projector.out_projection.0.weight"])).float()
    b1 = torch.as_tensor(np.asarray(sd["model.mm_projector.out_projection.0.bias"])).float()
    w2 = torch.as_tensor(np.asarray(sd["model.mm_projector.out_projection.2.weight"])).float()
    b2 = torch.as_tensor(np.asarray(sd["model.mm_projector.out_projection.2.bias"])).float()
    return F.linear(F.gelu(F.linear(x, w1, b1)), w2, b2)


def torch_grounding_scores(sd, cfg, frames_u8: np.ndarray, text_ids: list,
                           attn: str = "eager") -> np.ndarray:
    """Reference-semantics sigmoid scores [T] for one video (fp32 CPU)."""
    import contextlib

    import torch

    from videoitg_tpu.ops.preprocess import preprocess_frames_reference

    vision, lm = build_torch_stack(sd, cfg, attn=attn)
    pixels = preprocess_frames_reference(frames_u8, out_size=cfg.vision.image_size)
    pixels = torch.from_numpy(pixels.transpose(0, 3, 1, 2))  # NCHW

    @contextlib.contextmanager
    def no_causal_mask():
        # sdpa path: stop Qwen2Model from synthesizing a causal mask so SDPA
        # receives mask=None + is_causal=False -> torch's flash CPU kernel.
        import transformers.models.qwen2.modeling_qwen2 as qm

        orig = qm.create_causal_mask
        qm.create_causal_mask = lambda **kw: None
        try:
            yield
        finally:
            qm.create_causal_mask = orig

    with torch.no_grad():
        feats = vision(pixels, output_hidden_states=True).hidden_states[-2]
        t = feats.shape[0]
        ori = cfg.vision.num_patches_per_side
        hw = min(int(math.floor(math.sqrt(cfg.projector.vision_token_num / t))), ori)
        img = torch_seq_mlp(sd, feats, hw)                 # [T, hw^2, H]
        img = img.reshape(1, t * hw * hw, -1)

        embed_w = torch.as_tensor(np.asarray(sd["model.embed_tokens.weight"])).float()
        txt = embed_w[torch.as_tensor(text_ids, dtype=torch.long)][None]
        x = torch.cat([img, txt], dim=1)                   # image-first splice
        s = x.shape[1]
        positions = torch.arange(s, dtype=torch.long)[None]
        if attn == "sdpa":
            with no_causal_mask():
                hidden = lm(inputs_embeds=x, attention_mask=None,
                            position_ids=positions).last_hidden_state
        else:
            full_mask = torch.zeros((1, 1, s, s))           # bidirectional
            hidden = lm(
                inputs_embeds=x, attention_mask=full_mask, position_ids=positions
            ).last_hidden_state
        frame_hidden = hidden[:, : t * hw * hw, :].reshape(1, t, hw * hw, -1).mean(2)
        w = torch.as_tensor(np.asarray(sd["out_proj.weight"])).float()
        b = torch.as_tensor(np.asarray(sd["out_proj.bias"])).float()
        logits = (frame_hidden @ w.T + b)[0, :, 0]
        return torch.sigmoid(logits.float()).numpy()


# --------------------------------------------------------------------------
# harness
# --------------------------------------------------------------------------


def topk_contract(index_desc: list, k: int) -> list:
    """First k score-descending ids, ascending (internvl2.py:114-123)."""
    return sorted(index_desc[:k])


def run_parity(checkpoint: str, video: str, prompt: str, num_frames: int,
               target_fps: float, topks, out_json: str | None = None,
               use_flash: bool = False, oracle_attn: str = "eager") -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from videoitg_tpu.checkpoint import convert_grounding_checkpoint, load_hf_state_dict
    from videoitg_tpu.config import GroundingConfig
    from videoitg_tpu.data.tokenizer import grounding_text_ids
    from videoitg_tpu.data.video import read_video_frames
    from videoitg_tpu.engine import SelectionEngine

    cfg_path = os.path.join(checkpoint, "videoitg_tpu_config.json")
    if os.path.exists(cfg_path):
        cfg = GroundingConfig.from_json(open(cfg_path).read())
    else:
        cfg = GroundingConfig.videoitg_8b()

    tokenizer = AutoTokenizer.from_pretrained(checkpoint, use_fast=True)
    sd = load_hf_state_dict(checkpoint)

    # One decode feeds both stacks (the infer.py rounding, mm_utils.py:33-41).
    frames, sampled = read_video_frames(
        video, num_frames=num_frames, target_fps=target_fps, sampling="infer")
    text_ids = grounding_text_ids(prompt, tokenizer, cfg.max_text_len)

    print(f"[parity] {len(sampled)} frames, {len(text_ids)} text tokens, "
          f"video={video}, use_flash={use_flash}, oracle={oracle_attn}")

    scores_t = torch_grounding_scores(sd, cfg, frames, text_ids, attn=oracle_attn)

    params = convert_grounding_checkpoint(sd, cfg, dtype=jnp.float32)
    engine = SelectionEngine(
        params, cfg, tokenizer, dtype=jnp.float32, use_flash=use_flash,
        num_frames=num_frames, target_fps=target_fps,
        buckets=(len(sampled),),
    )
    res = engine.select(frames, sampled, prompt, video_path=video)
    scores_j = res.raw_scores

    # torch-side ranking with identical semantics (stable descending sort).
    order_t = np.argsort(-scores_t, kind="stable")
    index_t = [int(sampled[i]) for i in order_t]

    report = {
        "video": video, "checkpoint": checkpoint, "num_frames": len(sampled),
        "max_abs_score_diff": float(np.abs(scores_j - scores_t).max()),
        "scores_2dp_equal": bool(
            np.array_equal(np.round(scores_j, 2), np.round(scores_t, 2))),
    }
    ok = report["scores_2dp_equal"]
    for k in topks:
        k_eff = min(k, len(sampled))
        same = topk_contract(res.index, k_eff) == topk_contract(index_t, k_eff)
        report[f"top{k}_index_equal"] = bool(same)
        ok = ok and same
    report["pass"] = bool(ok)

    print(json.dumps(report, indent=2))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(report, f, indent=2)
    return report


# --------------------------------------------------------------------------
# selftest: synthesize a torch-authored full-layout checkpoint + video
# --------------------------------------------------------------------------


def synthesize_checkpoint(out_dir: str, cfg=None, seed: int = 0) -> str:
    """Write a tiny reference-layout EagleQwenG checkpoint (torch-authored
    safetensors + real fast tokenizer), loadable by both stacks."""
    import torch
    from safetensors.numpy import save_file

    from videoitg_tpu.config import GroundingConfig

    cfg = cfg or GroundingConfig.tiny()
    os.makedirs(out_dir, exist_ok=True)

    torch.manual_seed(seed)
    from transformers import Qwen2Model, SiglipVisionModel

    vision = SiglipVisionModel(_hf_vision_config(cfg)).eval()
    lm = Qwen2Model(_hf_lm_config(cfg)).eval()

    sd = {}
    for k, v in lm.state_dict().items():
        sd["model." + k] = v.numpy()
    for k, v in vision.state_dict().items():
        if ".head." in k or "post_layernorm" in k:
            continue  # grounding uses hidden_states[-2]; match real ckpt shape
        sd["model.vision_tower.vision_tower." + k] = v.numpy()
    g = torch.Generator().manual_seed(seed + 1)
    d_in, d_out = cfg.projector.input_dim, cfg.projector.output_dim
    sd["model.mm_projector.out_projection.0.weight"] = (
        torch.randn(d_out, d_in, generator=g) * d_in ** -0.5).numpy()
    sd["model.mm_projector.out_projection.0.bias"] = torch.zeros(d_out).numpy()
    sd["model.mm_projector.out_projection.2.weight"] = (
        torch.randn(d_out, d_out, generator=g) * d_out ** -0.5).numpy()
    sd["model.mm_projector.out_projection.2.bias"] = torch.zeros(d_out).numpy()
    sd["out_proj.weight"] = (torch.randn(1, cfg.lm.hidden_size, generator=g)
                             * cfg.lm.hidden_size ** -0.5).numpy()
    sd["out_proj.bias"] = torch.zeros(1).numpy()
    save_file(sd, os.path.join(out_dir, "model.safetensors"))

    with open(os.path.join(out_dir, "videoitg_tpu_config.json"), "w") as f:
        f.write(cfg.to_json())

    # Real fast tokenizer so AutoTokenizer (the real-weights path) loads it.
    from tokenizers import Tokenizer, models, pre_tokenizers

    words = ("find the frames where rocket launches what happens when color "
             "changes a is of to in and <unk>").split()
    vocab = {w: i + 1 for i, w in enumerate(words)}
    vocab["<unk>"] = 0
    tok = Tokenizer(models.WordLevel(vocab=vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.save(os.path.join(out_dir, "tokenizer.json"))
    with open(os.path.join(out_dir, "tokenizer_config.json"), "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast"}, f)
    return out_dir


def selftest(tmp_dir: str) -> dict:
    from videoitg_tpu.data.video import write_test_video

    ckpt = synthesize_checkpoint(os.path.join(tmp_dir, "ckpt"))
    video = write_test_video(os.path.join(tmp_dir, "vid.mp4"), 64, 48, 40, 10, 8)
    report = run_parity(
        ckpt, video, "find the frames where the rocket launches",
        num_frames=8, target_fps=2.0, topks=(3, 8),
        out_json=os.path.join(tmp_dir, "parity.json"),
    )
    if not report["pass"]:
        raise SystemExit("selftest FAILED")
    print("[parity] selftest PASS")
    return report


def selftest_8b(tmp_dir: str, frames: int = 64, budget: int = 16384,
                flash_budget: int = 1024) -> dict:
    """Parity selftest at the REAL VideoITG-8B geometry (VERDICT r2 #1).

    Two arms, both at flagship widths (hidden 3584, GQA 28q/4kv, head_dim
    128, vision 1152/16h/729 patches) with 2 LM + 2 effective vision layers:

    * oracle arm — seq_mlp budget 16384 at `frames` frames, so the packed
      splice is >= the flagship's 12.9k tokens (at 64 frames HW=16 ->
      16384+text tokens); JAX runs the XLA oracle path, torch runs its
      flash CPU SDPA kernel non-causally.
    * flash arm — the in-tree Pallas kernels (interpret mode on CPU) through
      the FULL model vs the same torch oracle, at a reduced token budget
      (interpret-mode cost), covering flash_mha (LM, native GQA at 28q/4kv,
      D=128) and flash_mha_short (vision, S=729, D=72).
    """
    from videoitg_tpu.config import GroundingConfig
    from videoitg_tpu.data.video import write_test_video

    video = write_test_video(os.path.join(tmp_dir, "vid8b.mp4"),
                             96, 64, 2 * frames, 10, 12)
    prompt = "find the frames where the rocket launches"
    reports = {}
    ckpt = synthesize_checkpoint(
        os.path.join(tmp_dir, "ckpt8b"), cfg=GroundingConfig.videoitg_8b_shallow())
    for arm, arm_budget, use_flash in (("oracle", budget, False),
                                       ("flash", flash_budget, True)):
        # Same weights, different seq_mlp budget: only the config differs.
        cfg = GroundingConfig.videoitg_8b_shallow(vision_token_num=arm_budget)
        with open(os.path.join(ckpt, "videoitg_tpu_config.json"), "w") as f:
            f.write(cfg.to_json())
        report = run_parity(
            ckpt, video, prompt, num_frames=frames, target_fps=4.0,
            topks=(8, 32), use_flash=use_flash, oracle_attn="sdpa",
            out_json=os.path.join(tmp_dir, f"parity_8b_{arm}.json"),
        )
        if not report["pass"]:
            raise SystemExit(f"selftest-8b {arm} arm FAILED")
        print(f"[parity] selftest-8b {arm} arm PASS "
              f"(max_abs_score_diff={report['max_abs_score_diff']:.2e})")
        reports[arm] = report
    return reports


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--checkpoint", help="HF-format VideoITG checkpoint dir")
    p.add_argument("--video", help="video file")
    p.add_argument("--prompt", default="Describe the key moment.",
                   help="instruction to ground")
    p.add_argument("--num-frames", type=int, default=512)
    p.add_argument("--target-fps", type=float, default=2.0,
                   help="infer.py demo default (infer.py:44)")
    p.add_argument("--topk", type=int, nargs="+", default=[8, 32])
    p.add_argument("--out-json", default=None)
    p.add_argument("--selftest", action="store_true",
                   help="synthesize a tiny checkpoint + video and verify")
    p.add_argument("--selftest-geometry", choices=["tiny", "8b"], default="tiny",
                   help="8b = flagship widths/heads with few layers "
                        "(heavy: ~15 min CPU for the 16k-token oracle arm)")
    p.add_argument("--selftest-frames", type=int, default=64)
    p.add_argument("--selftest-budget", type=int, default=16384,
                   help="seq_mlp vision_token_num for the 8b oracle arm")
    args = p.parse_args(argv)

    if args.selftest:
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            if args.selftest_geometry == "8b":
                selftest_8b(d, frames=args.selftest_frames,
                            budget=args.selftest_budget)
            else:
                selftest(d)
        return 0

    if not args.checkpoint or not args.video:
        p.error("--checkpoint and --video required (or --selftest)")
    report = run_parity(args.checkpoint, args.video, args.prompt,
                        args.num_frames, args.target_fps, args.topk,
                        out_json=args.out_json)
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
