"""Step-time the grounding finetune at the reference's FLAGSHIP geometry.

The released grounding recipe trains at 1024 frames / vision_token_num
16384 (reference scripts/videoitg/finetune-qwen2-7b-grounding.sh:33-37:
--video_frames 1024 --vision_token_num 16384 --vision_min_num 1), i.e.
hw = floor(sqrt(16384/1024)) = 4 -> 16384 vision tokens + text ~= 16.4k
tokens per sample. Until round 5 the repo had only ever step-timed the
32- and 128-frame buckets on chip (VERDICT r4 weak item). This runner
measures the real thing on one v5e:

  phase A  --precompute-features: frozen-tower forward over every video
           (1024 frames each) into the int8 feature cache — the HBM-fit
           strategy: training steps then skip decode+preprocess+tower.
  phase B  2B + rank-16 LoRA train steps at the 1024-frame bucket,
           hw pinned to 4 (--vision-min-num 4 => one compiled program),
           feature-cache hits only. Steady-state s/step = min over the
           post-compile logging windows.

Usage:  python scripts/train/flagship_step_time.py [--steps 8] [--videos 4]
        [--no-cache]   (--no-cache: decode+tower inside the step, for A/B)
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
N_FRAMES = 1024
BUDGET = 16384
HW = 4  # floor(sqrt(16384/1024)); --vision-min-num 4 pins the draw


def _text_len() -> int:
    """The preset's max_text_len bucket (deferred import: the subprocess
    launcher itself never needs jax)."""
    from videoitg_tpu.config import preset

    return preset("videoitg-2b").max_text_len


def build_data(workdir: str, n_videos: int) -> str:
    from videoitg_tpu.data.video import write_test_video

    vids = os.path.join(workdir, "vids")
    os.makedirs(vids, exist_ok=True)
    records = []
    for i in range(n_videos):
        path = os.path.join(vids, f"v{i}.mp4")
        if not os.path.exists(path):
            # >= N_FRAMES real frames so the sampler never duplicates
            write_test_video(path, 64, 48, N_FRAMES + 26, 10, 16)
        records.append({"video": f"vids/v{i}.mp4",
                        "question": f"find clip {i}",
                        "clip_num": [i % N_FRAMES]})
    data = os.path.join(workdir, "ground.json")
    with open(data, "w") as f:
        json.dump(records, f)
    return data


def train_cmd(workdir: str, data: str, out_dir: str, steps: int,
              cache_dir: str | None, batch: int, lora: int,
              quantize_base: str | None) -> list:
    cmd = [
        sys.executable, "-m", "videoitg_tpu.cli.train",
        "--preset", "videoitg-2b", "--random-init",
        "--data-path", data, "--image-folder", workdir,
        "--video-frames", str(N_FRAMES), "--fps", "10",
        "--vision-token-num", str(BUDGET), "--vision-min-num", str(HW),
        "--learning-rate", "2e-4", "--out-proj-lr", "2e-3",
        "--warmup-ratio", "0.03", "--lr-scheduler-type", "cosine",
        "--total-steps", str(steps), "--save-steps", str(steps * 10),
        "--per-device-train-batch-size", str(batch),
        "--num-train-epochs", "1000",
        "--output-dir", out_dir, "--logging-steps", "1", "--seed", "7",
    ]
    if lora:
        cmd += ["--lora", str(lora)]
    if quantize_base:
        cmd += ["--quantize-base", quantize_base]
    if cache_dir:
        cmd += ["--feature-cache", cache_dir, "--feature-cache-dtype", "int8"]
    return cmd


def run_logged(cmd: list, log_path: str, timeout_s: int) -> str:
    with open(log_path, "w") as log:
        proc = subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT,
                                cwd=REPO)
        try:
            proc.wait(timeout=timeout_s)
        finally:
            if proc.poll() is None:
                proc.kill()
    with open(log_path) as f:
        out = f.read()
    if proc.returncode != 0:
        sys.stderr.write(out[-4000:])
        raise SystemExit(f"{' '.join(cmd[:4])}... rc={proc.returncode}")
    return out


def run_synthetic(steps: int, lora: int, quantize_base: str | None,
                  batch: int) -> None:
    """Device-compute-only steady-state: one on-device feature batch
    (the cache-hit path's [B, T, P, C] form), run_step in a loop.

    Through THIS sandbox's tunnel the pipeline arm pays a ~1.7 GB/step
    feature upload (host->device is tunneled; on a real host that copy is
    PCIe ~0.1 s and prefetch hides it), so the synthetic arm is the
    honest measure of the train step itself at the flagship geometry.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from videoitg_tpu.utils.common import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    from videoitg_tpu.config import preset
    from videoitg_tpu.models.grounding import GroundingBatch, init_grounding
    from videoitg_tpu.train.lora import add_lora, make_lora_optimizer
    from videoitg_tpu.train.train_step import (
        create_train_state, make_train_step, run_step,
    )

    cfg = preset("videoitg-2b")
    dtype = jnp.bfloat16
    params = init_grounding(jax.random.PRNGKey(0), cfg, dtype=dtype)
    if quantize_base == "int8":
        from videoitg_tpu.ops.quant import quantize_grounding_int8

        params = quantize_grounding_int8(params)
    params = add_lora(params, jax.random.PRNGKey(1), rank=lora)
    tx = make_lora_optimizer(params, learning_rate=2e-4, total_steps=steps,
                             schedule="constant", warmup_ratio=0.0)
    state = create_train_state(params, tx)
    step_fn = make_train_step(cfg, tx, hw=HW, use_flash=True, remat=True,
                              donate=True)

    b, t = batch, N_FRAMES
    p_, c_ = cfg.vision.num_patches, cfg.vision.hidden_size
    feats = jax.random.normal(jax.random.PRNGKey(2), (b, t, p_, c_), dtype)
    labels = np.zeros((b, t), np.float32)
    labels[:, 7] = 1.0
    gb = GroundingBatch(
        frames=feats,
        frame_valid=jnp.ones((b, t), bool),
        text_ids=jnp.zeros((b, cfg.max_text_len), jnp.int32)
        .at[:, :5].set(jnp.arange(5) + 3),
        text_valid=jnp.zeros((b, cfg.max_text_len), bool)
        .at[:, :5].set(True),
        labels=jnp.asarray(labels),
    )
    seq = t * HW * HW + cfg.max_text_len
    print(f"[flagship-synthetic] 2B{'+int8' if quantize_base else ''} "
          f"LoRA r{lora} b={b} {t}f hw={HW} seq={seq}")

    t0 = time.time()
    state, metrics = run_step(step_fn, state, gb)
    _ = float(metrics["loss"])
    print(f"[flagship-synthetic] compile+step0: {time.time() - t0:.1f}s")
    try:
        ms = jax.devices()[0].memory_stats()
        print(f"[flagship-synthetic] HBM in use "
              f"{ms['bytes_in_use'] / 2**30:.2f} GiB / peak "
              f"{ms.get('peak_bytes_in_use', 0) / 2**30:.2f} GiB")
    except Exception:
        pass
    ts = []
    for _i in range(steps):
        t0 = time.time()
        state, metrics = run_step(step_fn, state, gb)
        _ = float(metrics["loss"])
        ts.append(time.time() - t0)
    print(json.dumps({
        "geometry": f"{t}f hw={HW} seq~{seq}",
        "tier": ("2b-qlora-int8" if quantize_base else "2b-lora")
                + f"-r{lora}",
        "batch": b,
        "mode": "synthetic-device-only",
        "windows_s_per_step": [round(x, 3) for x in ts],
        "steady_s_per_step": round(min(ts), 3),
    }))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--videos", type=int, default=4)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--lora", type=int, default=16)
    p.add_argument("--quantize-base", default=None, choices=[None, "int8"])
    p.add_argument("--no-cache", action="store_true")
    p.add_argument("--synthetic", action="store_true",
                   help="device-compute-only arm: on-device feature batch, "
                        "no input pipeline (tunnel-upload-free)")
    p.add_argument("--workdir", default="/tmp/videoitg_flagship_train")
    args = p.parse_args()

    if args.synthetic:
        run_synthetic(args.steps, args.lora, args.quantize_base, args.batch)
        return

    os.makedirs(args.workdir, exist_ok=True)
    out_dir = os.path.join(args.workdir, "out")
    cache_dir = None if args.no_cache else os.path.join(args.workdir, "fcache")

    t0 = time.time()
    data = build_data(args.workdir, args.videos)
    print(f"[flagship] data ready ({args.videos} x {N_FRAMES + 26}f videos, "
          f"{time.time() - t0:.0f}s)")

    if cache_dir:
        t0 = time.time()
        log = os.path.join(args.workdir, "precompute.log")
        run_logged(train_cmd(args.workdir, data, out_dir, args.steps,
                             cache_dir, args.batch, args.lora,
                             args.quantize_base)
                   + ["--precompute-features"], log, timeout_s=3600)
        t_pre = time.time() - t0
        print(f"[flagship] feature precompute: {t_pre:.0f}s total, "
              f"{t_pre / args.videos:.1f}s/video ({N_FRAMES}f tower fwd "
              f"+ decode, incl. compile)")

    log = os.path.join(args.workdir, "train.log")
    out = run_logged(train_cmd(args.workdir, data, out_dir, args.steps,
                               cache_dir, args.batch, args.lora,
                               args.quantize_base), log, timeout_s=5400)
    windows = [float(m) for m in re.findall(r"\(([\d.]+)s/step\)", out)]
    if not windows:
        sys.stderr.write(out[-4000:])
        raise SystemExit("no step-time windows in train log")
    steady = min(windows[1:]) if len(windows) > 1 else windows[0]
    summary = {
        # text length is the preset's max_text_len bucket, same as the
        # synthetic arm's seq accounting (NOT the +26 spare video frames)
        "geometry": f"{N_FRAMES}f hw={HW} seq~{N_FRAMES * HW * HW + _text_len()}",
        "tier": ("2b-qlora-int8" if args.quantize_base else "2b-lora")
                + (f"-r{args.lora}" if args.lora else "-full"),
        "batch": args.batch,
        "feature_cache": bool(cache_dir),
        "windows_s_per_step": windows,
        "steady_s_per_step": steady,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
