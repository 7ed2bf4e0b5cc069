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


def profile_decode_overlap(model: str, n_videos: int, num_frames: int):
    """Measure how much host decode time decode_ahead hides behind device
    scoring (VERDICT item 5: prove the pipeline, not just ship it).

    Synthesizes n real videos, then times (a) decode only, (b) serial
    decode->score, (c) the production decode_ahead pipeline.
    """
    import os
    import tempfile

    import numpy as np

    from videoitg_tpu.config import GroundingConfig, preset
    from videoitg_tpu.data.prefetch import decode_ahead
    from videoitg_tpu.data.video import read_video_frames, write_test_video
    from videoitg_tpu.engine import SelectionEngine
    from videoitg_tpu.utils.common import CharTokenizer

    on_cpu = jax.default_backend() == "cpu"
    if on_cpu:
        cfg = GroundingConfig.tiny()
        from videoitg_tpu.models.grounding import init_grounding

        params = init_grounding(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        engine = SelectionEngine(params, cfg, CharTokenizer(cfg.lm.vocab_size),
                                 dtype=jnp.float32, use_flash=False,
                                 buckets=(num_frames,))
        w, h, nf = 64, 48, num_frames * 2
    else:
        cfg = preset("videoitg-8b")
        from videoitg_tpu.models.projector import init_projector
        from videoitg_tpu.models.siglip import init_siglip
        from videoitg_tpu.ops.quant import apply_full_int8, init_qwen2_int8

        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
        params = apply_full_int8({
            "vision": init_siglip(k1, cfg.vision, dtype=jnp.bfloat16),
            "projector": init_projector(k2, cfg.projector, dtype=jnp.bfloat16),
            "lm": init_qwen2_int8(k3, cfg.lm, dtype=jnp.bfloat16),
            "out_proj": {"w": jax.random.normal(k4, (cfg.lm.hidden_size, 1),
                                                jnp.bfloat16) * 0.02,
                         "b": jnp.zeros((1,), jnp.bfloat16)},
        })
        engine = SelectionEngine(params, cfg, CharTokenizer(cfg.lm.vocab_size),
                                 dtype=jnp.bfloat16, buckets=(num_frames,))
        w, h, nf = 640, 480, num_frames * 2

    with tempfile.TemporaryDirectory() as d:
        paths = []
        for i in range(n_videos):
            paths.append(write_test_video(os.path.join(d, f"v{i}.mp4"),
                                          w, h, nf, 10, 16))
        work = [(i, p, {"q": "what happens?"}) for i, p in enumerate(paths)]

        def score(frames):
            s = engine.score_frames([frames], ["what happens?"])[0]
            return float(np.sum(s))  # force readback

        # warm the compile outside timed regions
        fr0, _ = read_video_frames(paths[0], num_frames=num_frames, target_fps=1)
        score(fr0)

        t0 = time.time()
        decs = [read_video_frames(p, num_frames=num_frames, target_fps=1)
                for p in paths]
        t_decode = time.time() - t0

        t0 = time.time()
        for fr, _ in decs:
            score(fr)
        t_score = time.time() - t0
        t_serial = t_decode + t_score

        t0 = time.time()
        n_ok = 0
        for dec in decode_ahead(work, num_frames=num_frames, target_fps=1,
                                sampling="eval", workers=2, ahead=4):
            assert dec.error is None, dec.error
            score(dec.frames)
            n_ok += 1
        t_overlap = time.time() - t0
        assert n_ok == n_videos

    hidden = t_serial - t_overlap
    print(f"videos={n_videos} frames={num_frames} ({w}x{h})")
    print(f"decode only            {t_decode*1e3:9.1f} ms")
    print(f"score only             {t_score*1e3:9.1f} ms")
    print(f"serial (decode+score)  {t_serial*1e3:9.1f} ms")
    print(f"decode_ahead pipeline  {t_overlap*1e3:9.1f} ms")
    print(f"host time hidden       {hidden*1e3:9.1f} ms "
          f"({100 * hidden / max(t_decode, 1e-9):.0f}% of decode)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="videoitg-8b-int8")
    p.add_argument("--num-frames", type=int, default=512)
    p.add_argument("--vision-chunk", type=int, default=128)
    p.add_argument("--pipeline-videos", type=int, default=0,
                   help="N>0: measure decode_ahead overlap on N synthesized "
                        "videos instead of the per-stage profile")
    p.add_argument("--act-int8", action="store_true",
                   help="full-int8 (dynamic activation quant) — the bench.py "
                        "headline tier; default here is weight-only int8")
    args = p.parse_args()

    from videoitg_tpu.utils.common import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    if args.pipeline_videos:
        profile_decode_overlap(args.model, args.pipeline_videos, args.num_frames)
        return

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

    if args.act_int8:
        from videoitg_tpu.ops.quant import apply_full_int8

        params = apply_full_int8(params)
        print("tier: full int8 (weights + dynamic activations)")

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
