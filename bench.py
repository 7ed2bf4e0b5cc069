"""Benchmark: frames scored per second per chip (512-frame instructed selection).

Runs the full on-device scoring path — SigLIP-SO400M over 512 frames,
seq_mlp projector (HW=5), 13k-token bidirectional Qwen2 prefill with the
Pallas flash kernel, per-frame scoring head — on one chip and prints ONE
JSON line {"metric", "value", "unit", "vs_baseline", ...extras}.

Model tiers (auto-selected by available HBM, overridable via --model):
  * videoitg-8b-int8 — the flagship 8B architecture with weight-only int8
    LM (bf16 does not fit a 16 GB v5e chip; multi-chip serving shards bf16).
  * videoitg-2b      — bf16, fits v5e comfortably.

Timing notes: inputs are generated on-device (this sandbox reaches the TPU
through a tunnel where host->device copies and `block_until_ready` are not
representative; a readback of the scores forces real completion).
Baseline: BASELINE.json north star, 2000 frames/sec/chip.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

BASELINE_FRAMES_PER_SEC = 2000.0
# FLOP-level reconciliation (BASELINE.md "North-star accounting",
# docs/PERF.md:334-340): one 512-frame video costs ~530 TFLOP, so a literal
# 2,000 f/s *per chip* needs ~2.1 PFLOP/s — >5x a v5e chip's int8 peak (394
# TOP/s) and >10x its bf16 peak. The physically defensible reading of the
# north star is AGGREGATE on v5e-8: >= 250 f/s/chip so that 8 chips clear
# 2k. vs_baseline keeps the literal denominator for cross-round continuity;
# vs_chip_bound reports against the per-chip silicon-consistent target.
CHIP_BOUND_FRAMES_PER_SEC = 250.0
# Round-5 reconciliation (docs/PERF.md "Speed-of-light accounting —
# RECONCILED"): composing the MEASURED per-stage floors (tower GEMM-only
# 1205 ms + amortized attention kernels 684 ms + projector + LM stage)
# bounds the single-question program at ~3.04 s/video => ~168 f/s. The
# old 300-380 "2x-peak int8" band is struck (XLA int8 GEMMs measure 253
# TFLOP/s, attention runs 48-113 TFLOP/s at its structural shapes).
# vs_floor reports against this measured-floor composition; the 250 f/s
# chip bound remains reachable only by the Q>=3 tower-reuse workload.
FLOOR_FRAMES_PER_SEC = 168.0


def _build_params(model: str, dtype, act_int8: bool):
    """(cfg, params, model_tag) for a bench tier."""
    import jax
    import jax.numpy as jnp

    from videoitg_tpu.config import GroundingConfig
    from videoitg_tpu.models.grounding import init_grounding

    if model in ("videoitg-8b-int8", "videoitg-8b-int4"):
        from videoitg_tpu.models.projector import init_projector
        from videoitg_tpu.models.siglip import init_siglip
        from videoitg_tpu.ops.quant import init_qwen2_int4, init_qwen2_int8

        cfg = GroundingConfig.videoitg_8b()
        k = jax.random.PRNGKey(0)
        k1, k2, k3, k4 = jax.random.split(k, 4)
        init_lm = init_qwen2_int4 if model.endswith("int4") else init_qwen2_int8
        params = {
            "vision": init_siglip(k1, cfg.vision, dtype=dtype),
            "projector": init_projector(k2, cfg.projector, dtype=dtype),
            "lm": init_lm(k3, cfg.lm, dtype=dtype),
            "out_proj": {
                "w": jax.random.normal(k4, (cfg.lm.hidden_size, 1), dtype) * 0.02,
                "b": jnp.zeros((1,), dtype),
            },
        }
    else:
        cfg = {"videoitg-2b": GroundingConfig.videoitg_2b,
               "videoitg-8b": GroundingConfig.videoitg_8b,
               "tiny": GroundingConfig.tiny}[model]()
        params = init_grounding(jax.random.PRNGKey(0), cfg, dtype=dtype)

    if act_int8:
        from videoitg_tpu.ops.quant import apply_full_int8

        params = apply_full_int8(params)
        model = model + "+act8"
    return cfg, params, model


def run_bench(model: str, num_frames: int, iters: int, text_len: int,
              act_int8: bool = False, batch: int = 1) -> dict:
    import jax
    import jax.numpy as jnp

    from videoitg_tpu.utils.common import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    from videoitg_tpu.models.grounding import GroundingBatch, grounding_logits
    from videoitg_tpu.models.projector import inference_hw

    on_cpu = jax.default_backend() == "cpu"
    dtype = jnp.float32 if on_cpu else jnp.bfloat16
    use_flash = not on_cpu

    cfg, params, model = _build_params(model, dtype, act_int8)

    hw = inference_hw(cfg.projector, num_frames, cfg.vision.num_patches_per_side)
    s = cfg.vision.image_size
    seq_len = num_frames * hw * hw + text_len

    # On-device synthetic input (no tunnel transfer in the timed region).
    frames = jax.random.normal(
        jax.random.PRNGKey(1), (batch, num_frames, s, s, 3), dtype=dtype)
    frame_valid = jnp.ones((batch, num_frames), dtype=bool)
    text_ids = jax.random.randint(
        jax.random.PRNGKey(2), (batch, text_len), 0, cfg.lm.vocab_size, dtype=jnp.int32)
    text_valid = jnp.ones((batch, text_len), dtype=bool)

    # Chunk the vision tower so 512-frame activations fit beside the int8 8B
    # weights on one 16 GB chip (reference chunks at 384 for its GPUs).
    vision_chunk = 128 if num_frames > 128 else 0

    @jax.jit
    def score(params, frames, frame_valid, text_ids, text_valid):
        batch = GroundingBatch(frames=frames, frame_valid=frame_valid,
                               text_ids=text_ids, text_valid=text_valid)
        return jax.nn.sigmoid(
            grounding_logits(params, batch, cfg, hw=hw, use_flash=use_flash,
                             vision_chunk=vision_chunk)
            .astype(jnp.float32))

    args = (params, frames, frame_valid, text_ids, text_valid)
    t0 = time.time()
    out = score(*args)
    _ = float(out.sum())  # force completion through the tunnel
    compile_s = time.time() - t0

    times = []
    for _i in range(iters):
        t0 = time.time()
        out = score(*args)
        _ = float(out.sum())
        times.append(time.time() - t0)
    dt = min(times)
    fps = batch * num_frames / dt

    return {
        "metric": "frames scored/sec/chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FRAMES_PER_SEC, 3),
        "vs_chip_bound": round(fps / CHIP_BOUND_FRAMES_PER_SEC, 3),
        "vs_floor": round(fps / FLOOR_FRAMES_PER_SEC, 3),
        "model": model,
        "batch": batch,
        "num_frames": num_frames,
        "hw": hw,
        "seq_len": seq_len,
        "per_video_ms": round(dt * 1e3, 1),
        "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }


class _ByteTok:
    """Deterministic stand-in tokenizer (bench has no checkpoint/vocab)."""

    bos_token_id = None

    def __call__(self, text):
        class R:
            pass

        r = R()
        r.input_ids = [ord(c) % 255 + 1 for c in text]
        return r


def run_engine_bench(model: str, num_frames: int, n_videos: int,
                     act_int8: bool = False, width: int = 480,
                     height: int = 360, transfer: str = "rgb") -> dict:
    """Sustained end-to-end engine throughput + per-video selection latency.

    BASELINE.json's metric is "frames scored/sec/chip ...; p50 per-video
    selection latency" — the program-only number above excludes host decode,
    preprocess upload, and readback. This phase runs >= n_videos real video
    files through the full SelectionEngine pipeline (libav decode with
    decode-ahead prefetch -> device resize/normalize -> compiled scoring ->
    ranked result) and reports sustained frames/s plus p50/p95 per-video
    latency. Caveats recorded in docs/PERF.md: synthetic solid-color videos
    decode cheaper than real footage, and this sandbox reaches the TPU via a
    tunnel whose host->device path is far slower than a real host's PCIe.
    """
    import os
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    from videoitg_tpu.data.prefetch import decode_ahead
    from videoitg_tpu.data.video import write_test_video
    from videoitg_tpu.engine import SelectionEngine

    from videoitg_tpu.utils.common import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    on_cpu = jax.default_backend() == "cpu"
    dtype = jnp.float32 if on_cpu else jnp.bfloat16
    cfg, params, model_tag = _build_params(model, dtype, act_int8)

    engine = SelectionEngine(
        params, cfg, _ByteTok(), dtype=dtype, use_flash=not on_cpu,
        num_frames=num_frames, target_fps=10.0, buckets=(num_frames,),
        transfer=transfer)

    prompt = "Find the frames where the key action happens."
    with tempfile.TemporaryDirectory() as d:
        paths = [
            write_test_video(os.path.join(d, f"v{i}.mp4"), width, height,
                             num_frames, 10, 24)
            for i in range(n_videos)
        ]
        # Warmup: first video triggers the (bucket, hw, 1) compile.
        t0 = time.time()
        engine.select_from_file(paths[0], prompt)
        compile_s = time.time() - t0
        engine.timer.totals.clear()  # drop warmup/compile from stage stats
        engine.timer.counts.clear()

        lat = []
        t_start = t_prev = time.time()
        items = [(i, p, None) for i, p in enumerate(paths)]
        # post=preprocess_ahead: the worker thread starts video i+1's
        # device upload+preprocess while the main thread waits on video i's
        # score readback — upload no longer serializes behind scoring.
        for dec in decode_ahead(items, num_frames=num_frames, target_fps=10.0,
                                sampling="eval", workers=2, ahead=3,
                                pix_fmt=transfer,
                                post=engine.preprocess_ahead):
            if dec.error is not None:
                raise dec.error
            res = engine.select(dec.frames, dec.sampled, prompt)
            assert len(res.index) == num_frames
            t_now = time.time()
            lat.append(t_now - t_prev)
            t_prev = t_now
        total = time.time() - t_start

    # Stage decomposition (decode is mostly hidden by the prefetch threads;
    # "preprocess" includes the host->device pixel upload, "score" the
    # compiled program + readback).
    stages = {name: round(1e3 * engine.timer.totals[name] /
                          max(1, engine.timer.counts[name]), 1)
              for name in sorted(engine.timer.totals)}
    return {
        "sustained_fps": round(num_frames * n_videos / total, 1),
        "video_p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 1),
        "video_p95_ms": round(float(np.percentile(lat, 95)) * 1e3, 1),
        "engine_videos": n_videos,
        "engine_video_shape": f"{num_frames}x{height}x{width}",
        "engine_compile_s": round(compile_s, 1),
        "engine_stage_mean_ms": stages,
        "engine_model": model_tag,
    }


def run_reuse_bench(model: str, num_frames: int, act_int8: bool = False,
                    iters: int = 3) -> dict:
    """Cross-question tower reuse (engine.encode_video + score_encoded).

    The VideoITG-40K workload averages ~12 annotations/video and Video-MME
    asks 3 questions/video; the reference re-runs decode+tower+LM per
    question (infer.py:53-79). This phase measures the encode-once cost
    and the per-question feature-scoring cost, then reports the effective
    frames-scored/sec at Q=3 and Q=12 questions/video:
        fps(Q) = Q * T / (t_encode + Q * t_question)
    """
    import jax
    import jax.numpy as jnp

    from videoitg_tpu.engine import PreprocessedVideo, SelectionEngine
    from videoitg_tpu.utils.common import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    on_cpu = jax.default_backend() == "cpu"
    dtype = jnp.float32 if on_cpu else jnp.bfloat16
    cfg, params, model_tag = _build_params(model, dtype, act_int8)
    engine = SelectionEngine(
        params, cfg, _ByteTok(), dtype=dtype, use_flash=not on_cpu,
        num_frames=num_frames, buckets=(num_frames,))

    s = cfg.vision.image_size
    pre = PreprocessedVideo(
        jax.random.normal(jax.random.PRNGKey(1), (num_frames, s, s, 3),
                          dtype=dtype), num_frames)

    def readback(x):
        return float(jnp.asarray(x).sum())  # tunnel-safe completion fence

    t0 = time.time()
    enc = engine.encode_video(pre)
    readback(enc.feats)
    encode_compile_s = time.time() - t0
    enc_times = []
    for _ in range(iters):
        t0 = time.time()
        enc = engine.encode_video(pre)
        readback(enc.feats)
        enc_times.append(time.time() - t0)
    t_enc = min(enc_times)

    prompts = [f"Find the frames answering question {i} about the scene."
               for i in range(4)]
    t0 = time.time()
    readback(engine.score_encoded(enc, prompts[:1])[0])
    question_compile_s = time.time() - t0
    q_times = []
    for i in range(iters):
        t0 = time.time()
        readback(engine.score_encoded(enc, [prompts[i % 4]])[0])
        q_times.append(time.time() - t0)
    t_q = min(q_times)

    out = {
        "reuse_encode_ms": round(t_enc * 1e3, 1),
        "reuse_per_question_ms": round(t_q * 1e3, 1),
        "reuse_compile_s": round(encode_compile_s + question_compile_s, 1),
        "reuse_model": model_tag,
    }
    for q in (3, 12):
        out[f"reuse_fps_q{q}"] = round(q * num_frames / (t_enc + q * t_q), 1)
    return out


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=None,
                   choices=[None, "videoitg-8b-int8", "videoitg-8b-int4",
                            "videoitg-8b", "videoitg-2b", "tiny"])
    p.add_argument("--num-frames", type=int, default=512)
    p.add_argument("--batch", type=int, default=1,
                   help="videos per compiled step (B>1 amortizes bubbles; "
                        "HBM-bound at 8B)")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--text-len", type=int, default=64)
    p.add_argument("--act-int8", action="store_true",
                   help="dynamic int8 activation quant (default for the 8B tier)")
    p.add_argument("--no-act-int8", action="store_true",
                   help="weight-only int8 (bf16 activations)")
    p.add_argument("--engine-videos", type=int, default=8,
                   help="videos for the sustained engine phase (0 = skip)")
    p.add_argument("--no-reuse-bench", action="store_true",
                   help="skip the cross-question tower-reuse phase")
    args = p.parse_args()

    import jax

    model = args.model
    if model is None:
        if jax.default_backend() == "cpu":
            model, args.num_frames, args.iters = "tiny", 8, 1
        else:
            model = "videoitg-8b-int8"

    # Default for the single-chip 8B tier: full int8 (weights + dynamic
    # per-token activations — the reference itself ships 8-bit serving via
    # bitsandbytes); the weight-only configuration is measured alongside and
    # reported as a secondary figure.
    act_int8 = (args.act_int8 or model in ("videoitg-8b-int8", "videoitg-8b-int4")
                ) and not args.no_act_int8

    try:
        result = run_bench(model, args.num_frames, args.iters, args.text_len,
                           act_int8=act_int8, batch=args.batch)
        if act_int8 and model == "videoitg-8b-int8" and args.batch == 1:
            try:
                wo = run_bench(model, args.num_frames, args.iters, args.text_len,
                               act_int8=False)
                result["weight_only_int8_fps"] = wo["value"]
            except Exception:
                pass
    except Exception as e:  # fall back to the 2B tier rather than report nothing
        if model == "videoitg-8b-int8":
            result = run_bench("videoitg-2b", args.num_frames, args.iters,
                               args.text_len, batch=args.batch)
            result["fallback_reason"] = f"8b-int8 failed: {type(e).__name__}: {e}"[:200]
        else:
            raise

    # Sustained engine phase (decode -> preprocess -> score, decode-ahead on):
    # the e2e counterpart of the program-only headline (VERDICT r2 item 3).
    if args.engine_videos > 0:
        try:
            n_vid = args.engine_videos
            ew, eh = (480, 360)
            if jax.default_backend() == "cpu":
                n_vid, (ew, eh) = min(n_vid, 3), (96, 64)
            # Benchmark the tier that actually produced the headline (the
            # 8b -> 2b fallback may have swapped it).
            eng_model = result["model"].replace("+act8", "")
            eng_act8 = result["model"].endswith("+act8")
            result.update(run_engine_bench(
                eng_model, args.num_frames, n_vid,
                act_int8=eng_act8, width=ew, height=eh))
            # YUV420 transfer arm: native planes (half the upload bytes) +
            # device-side BT.601 — the sustained path's main host-side lever.
            yv = run_engine_bench(
                eng_model, args.num_frames, n_vid,
                act_int8=eng_act8, width=ew, height=eh, transfer="yuv420")
            result["yuv420_sustained_fps"] = yv["sustained_fps"]
            result["yuv420_video_p50_ms"] = yv["video_p50_ms"]
            result["yuv420_stage_mean_ms"] = yv["engine_stage_mean_ms"]
        except Exception as e:
            result["engine_bench_error"] = f"{type(e).__name__}: {e}"[:200]

    # Cross-question tower reuse: effective frames/s when one video takes
    # Q questions (VideoITG-40K averages ~12 annotations/video).
    if not args.no_reuse_bench:
        try:
            result.update(run_reuse_bench(
                result["model"].replace("+act8", ""), args.num_frames,
                act_int8=result["model"].endswith("+act8"),
                iters=args.iters))
            if result.get("reuse_fps_q12"):
                result["vs_baseline_q12"] = round(
                    result["reuse_fps_q12"] / BASELINE_FRAMES_PER_SEC, 3)
                result["vs_chip_bound_q12"] = round(
                    result["reuse_fps_q12"] / CHIP_BOUND_FRAMES_PER_SEC, 3)
        except Exception as e:
            result["reuse_bench_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
