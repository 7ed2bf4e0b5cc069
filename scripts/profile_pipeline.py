"""Per-stage on-device profiling of the 512-frame scoring pipeline.

Times the vision tower, the LM prefill, and the full scoring program
separately (readback-forced; see .claude/skills/verify/SKILL.md on the
tunnel's async block_until_ready). Run on the real chip:
    python scripts/profile_pipeline.py [--model videoitg-8b-int8]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=3, label=""):
    out = fn(*args)
    _ = float(jnp.sum(out.reshape(-1)[:8]))
    ts = []
    for _i in range(iters):
        t0 = time.time()
        out = fn(*args)
        _ = float(jnp.sum(out.reshape(-1)[:8]))
        ts.append(time.time() - t0)
    dt = min(ts)
    print(f"{label:<28} {dt * 1e3:9.1f} ms")
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="videoitg-8b-int8")
    p.add_argument("--num-frames", type=int, default=512)
    p.add_argument("--vision-chunk", type=int, default=128)
    args = p.parse_args()

    from videoitg_tpu.config import GroundingConfig
    from videoitg_tpu.models.grounding import GroundingBatch, grounding_logits
    from videoitg_tpu.models.projector import inference_hw, project_frames
    from videoitg_tpu.models.qwen2 import qwen2_hidden_states
    from videoitg_tpu.models.siglip import siglip_features

    dtype = jnp.bfloat16
    if args.model == "videoitg-8b-int8":
        from videoitg_tpu.models.projector import init_projector
        from videoitg_tpu.models.siglip import init_siglip
        from videoitg_tpu.ops.quant import init_qwen2_int8

        cfg = GroundingConfig.videoitg_8b()
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
        params = {
            "vision": init_siglip(k1, cfg.vision, dtype=dtype),
            "projector": init_projector(k2, cfg.projector, dtype=dtype),
            "lm": init_qwen2_int8(k3, cfg.lm, dtype=dtype),
            "out_proj": {"w": jax.random.normal(k4, (cfg.lm.hidden_size, 1), dtype) * 0.02,
                         "b": jnp.zeros((1,), dtype)},
        }
    else:
        from videoitg_tpu.models.grounding import init_grounding

        cfg = {"videoitg-2b": GroundingConfig.videoitg_2b,
               "videoitg-8b": GroundingConfig.videoitg_8b}[args.model]()
        params = init_grounding(jax.random.PRNGKey(0), cfg, dtype=dtype)

    t = args.num_frames
    hw = inference_hw(cfg.projector, t, cfg.vision.num_patches_per_side)
    s_img = cfg.vision.image_size
    l_txt = 64
    seq = t * hw * hw + l_txt
    print(f"model={args.model} frames={t} hw={hw} seq={seq}")

    chunk = args.vision_chunk
    frames_chunked = jax.random.normal(
        jax.random.PRNGKey(1), (t // chunk, chunk, s_img, s_img, 3), dtype=dtype)

    @jax.jit
    def vision_fn(p, fr):
        return jax.lax.map(
            lambda c: siglip_features(p, c, cfg.vision, use_flash=True), fr)

    dt_vision = timeit(vision_fn, params["vision"], frames_chunked,
                       label=f"vision tower ({t}f, chunk {chunk})")
    vision_tflops = t * cfg.vision.num_patches * (
        # qkv+o+mlp flops per token per layer
        (4 * cfg.vision.hidden_size ** 2 + 2 * 2 * cfg.vision.hidden_size
         * cfg.vision.intermediate_size) * 2
    ) * cfg.vision.num_effective_layers / 1e12
    print(f"  vision ~{vision_tflops:.0f} TFLOP -> {vision_tflops / dt_vision:.0f} TFLOP/s")

    feats = vision_fn(params["vision"], frames_chunked)
    feats = feats.reshape(t, cfg.vision.num_patches, cfg.vision.hidden_size)

    @jax.jit
    def proj_fn(p, f):
        return project_frames(p, f, hw)

    timeit(proj_fn, params["projector"], feats, label="projector")

    x = jax.random.normal(jax.random.PRNGKey(2), (1, seq, cfg.lm.hidden_size), dtype=dtype)
    positions = jnp.arange(seq, dtype=jnp.int32)[None]
    valid = jnp.ones((1, seq), dtype=bool)

    @jax.jit
    def lm_fn(p, x_, pos, v):
        return qwen2_hidden_states(p, x_, pos, v, cfg.lm, use_flash=True)

    dt_lm = timeit(lm_fn, params["lm"], x, positions, valid, label=f"LM prefill ({seq} tok)")
    lm_linear_tflops = seq * (
        (2 * cfg.lm.hidden_size * (cfg.lm.q_dim + 2 * cfg.lm.kv_dim)
         + 2 * cfg.lm.q_dim * cfg.lm.hidden_size
         + 3 * 2 * cfg.lm.hidden_size * cfg.lm.intermediate_size)
    ) * cfg.lm.num_layers / 1e12
    lm_attn_tflops = cfg.lm.num_layers * 4 * seq * seq * cfg.lm.q_dim / 1e12
    print(f"  LM ~{lm_linear_tflops:.0f} linear + {lm_attn_tflops:.0f} attn TFLOP "
          f"-> {(lm_linear_tflops + lm_attn_tflops) / dt_lm:.0f} TFLOP/s")

    frames_full = frames_chunked.reshape(1, t, s_img, s_img, 3)
    batch = GroundingBatch(
        frames=frames_full, frame_valid=jnp.ones((1, t), bool),
        text_ids=jnp.zeros((1, l_txt), jnp.int32), text_valid=jnp.ones((1, l_txt), bool),
    )

    @jax.jit
    def full_fn(p, b):
        return grounding_logits(p, b, cfg, hw=hw, use_flash=True, vision_chunk=chunk)

    dt_full = timeit(full_fn, params, batch, label="full scoring program")
    print(f"frames/s/chip: {t / dt_full:.1f}")


if __name__ == "__main__":
    main()
