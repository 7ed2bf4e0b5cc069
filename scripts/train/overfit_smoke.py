"""On-chip training smoke: the 2B tier must demonstrably LEARN (VERDICT r2 #6).

Beyond test_loss_decreases (3 steps, CPU): this runner overfits the 2B tier
on a synthetic 32-video grounding set until Top-1 selected-frame accuracy
passes a threshold on the training set, WITH one mid-run SIGKILL + orbax
auto-resume — exercising the LR groups (out_proj 10x), cosine+warmup
schedule, BCE pos_weight, checkpoint cadence, and resume in one loop, the
interactions step-level tests cannot catch (reference counterpart:
train_itg.py:1383-1397 + auto resume_from_checkpoint :1388-1391).

Task design: video i carries grounding label at frame (i % targets) and the
instruction "find clip {j}": the question tokens disambiguate the target,
so the model must couple text to frame scores — learnable by a random-init
stack in a few hundred steps. Budget/min pins training HW to 2 so the whole
run is ONE compiled program (tunnel compiles are minutes each).

Usage:  python scripts/train/overfit_smoke.py [--steps 300] [--videos 32]
        (bash scripts/train/overfit_smoke.sh wraps this)
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
N_FRAMES = 32
BUDGET, MIN_HW = 128, 2   # hw = floor(sqrt(128/32)) = 2 = min -> pinned


def build_data(workdir: str, n_videos: int, targets: int) -> str:
    from videoitg_tpu.data.video import write_test_video

    vids = os.path.join(workdir, "vids")
    os.makedirs(vids, exist_ok=True)
    records = []
    for i in range(n_videos):
        path = os.path.join(vids, f"v{i}.mp4")
        write_test_video(path, 64, 48, N_FRAMES, 10, 8)
        j = i % targets
        records.append({"video": f"vids/v{i}.mp4",
                        "question": f"find clip {j}",
                        "clip_num": [j]})
    data = os.path.join(workdir, "ground.json")
    with open(data, "w") as f:
        json.dump(records, f)
    return data


def train_cmd(workdir: str, data: str, out_dir: str, steps: int, lr: float,
              save_steps: int, batch: int = 2, lora: int = 0) -> list:
    extra = ["--lora", str(lora)] if lora else []
    return [
        sys.executable, "-m", "videoitg_tpu.cli.train",
        "--preset", "videoitg-2b", "--random-init",
        "--data-path", data, "--image-folder", workdir,
        "--video-frames", str(N_FRAMES), "--fps", "10",
        "--vision-token-num", str(BUDGET), "--vision-min-num", str(MIN_HW),
        "--learning-rate", str(lr), "--out-proj-lr", str(lr * 10),
        "--warmup-ratio", "0.03", "--lr-scheduler-type", "cosine",
        "--total-steps", str(steps), "--save-steps", str(save_steps),
        "--per-device-train-batch-size", str(batch),
        "--num-train-epochs", "1000",  # cycle the 32 videos until total-steps
        "--output-dir", out_dir, "--logging-steps", "5", "--seed", "7",
    ] + extra


def run_phase1_with_kill(cmd, out_dir: str, save_steps: int,
                         log_path: str) -> int:
    """Start training, wait for the first checkpoint, then SIGKILL."""
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    with open(log_path, "w") as log:
        proc = subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT,
                                cwd=REPO)
        try:
            deadline = time.time() + 40 * 60
            killed_at = None
            while time.time() < deadline:
                if proc.poll() is not None:
                    raise SystemExit(
                        f"phase-1 training exited early rc={proc.returncode} "
                        f"(see {log_path})")
                steps = [int(d) for d in os.listdir(ckpt_dir)
                         if d.isdigit()] if os.path.isdir(ckpt_dir) else []
                if steps and max(steps) >= save_steps:
                    time.sleep(3)  # let a few more steps run past the save
                    killed_at = max(steps)
                    proc.send_signal(signal.SIGKILL)
                    proc.wait()
                    return killed_at
                time.sleep(2)
        finally:
            if proc.poll() is None:
                proc.kill()
    raise SystemExit("phase-1 never reached a checkpoint within 40 min")


def evaluate(workdir: str, out_dir: str, n_videos: int, targets: int,
             steps: int, lr: float, lora: int = 0) -> float:
    """Restore the final orbax state and measure training-set Top-1."""
    import jax
    import jax.numpy as jnp

    from videoitg_tpu.utils.common import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    from videoitg_tpu.config import preset
    from videoitg_tpu.engine import SelectionEngine
    from videoitg_tpu.models.grounding import init_grounding
    from videoitg_tpu.train.checkpointing import TrainCheckpointer
    from videoitg_tpu.train.optimizer import make_grounding_optimizer
    from videoitg_tpu.train.train_step import create_train_state
    from videoitg_tpu.utils.common import CharTokenizer

    import dataclasses as dc

    cfg = preset("videoitg-2b")
    cfg = dc.replace(cfg, projector=dc.replace(
        cfg.projector, vision_token_num=BUDGET, vision_min_num=MIN_HW))
    on_cpu = jax.default_backend() == "cpu"
    dtype = jnp.float32 if on_cpu else jnp.bfloat16
    # Template must mirror cli/train's construction (same seed/tx labels).
    params = init_grounding(jax.random.PRNGKey(7), cfg, dtype=dtype)
    if lora:
        from videoitg_tpu.train.lora import add_lora, make_lora_optimizer

        params = add_lora(params, jax.random.PRNGKey(8), rank=lora)
        tx = make_lora_optimizer(
            params, learning_rate=lr, out_proj_lr=lr * 10, total_steps=steps,
            warmup_ratio=0.03, schedule="cosine")
    else:
        tx = make_grounding_optimizer(
            params, learning_rate=lr, out_proj_lr=lr * 10, total_steps=steps,
            warmup_ratio=0.03, schedule="cosine")
    state = create_train_state(params, tx)
    ckpt = TrainCheckpointer(out_dir)
    step, restored = ckpt.restore_latest(state)
    assert restored is not None, "no checkpoint to evaluate"
    print(f"[overfit] evaluating checkpoint at step {step}")

    engine = SelectionEngine(
        restored.params, cfg, CharTokenizer(cfg.lm.vocab_size), dtype=dtype,
        use_flash=not on_cpu, num_frames=N_FRAMES, target_fps=10.0,
        buckets=(N_FRAMES,))
    hits = 0
    for i in range(n_videos):
        j = i % targets
        res = engine.select_from_file(
            os.path.join(workdir, "vids", f"v{i}.mp4"), f"find clip {j}")
        hits += int(res.index[0] == j)
    return hits / n_videos


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--videos", type=int, default=32)
    p.add_argument("--targets", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--save-steps", type=int, default=25)
    p.add_argument("--batch", type=int, default=2,
                   help="per-step videos (2B FULL finetune at batch 4 OOMs "
                        "a 16 GB v5e; 8B training is mesh-only, PERF.md)")
    p.add_argument("--lora", type=int, default=0,
                   help="train rank-N adapters + head instead of full "
                        "weights (the single-chip fallback when the full "
                        "2B optimizer state does not fit)")
    p.add_argument("--workdir", default="/tmp/videoitg_overfit")
    p.add_argument("--threshold", type=float, default=0.9)
    args = p.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    out_dir = os.path.join(args.workdir, "run")
    data = build_data(args.workdir, args.videos, args.targets)
    cmd = train_cmd(args.workdir, data, out_dir, args.steps, args.lr,
                    args.save_steps, batch=args.batch, lora=args.lora)

    killed_at = run_phase1_with_kill(
        cmd, out_dir, args.save_steps, os.path.join(args.workdir, "phase1.log"))
    print(f"[overfit] phase 1 SIGKILLed after checkpoint step {killed_at}")

    log2 = os.path.join(args.workdir, "phase2.log")
    with open(log2, "w") as log:
        rc = subprocess.run(cmd, stdout=log, stderr=subprocess.STDOUT,
                            cwd=REPO).returncode
    text = open(log2).read()
    assert rc == 0, f"phase-2 training failed rc={rc} (see {log2})"
    assert "auto-resumed from step" in text, "phase 2 did not auto-resume"
    print("[overfit] phase 2 auto-resumed and completed")

    acc = evaluate(args.workdir, out_dir, args.videos, args.targets,
                   args.steps, args.lr, lora=args.lora)
    print(json.dumps({"top1_train_accuracy": acc, "steps": args.steps,
                      "videos": args.videos, "killed_at_step": killed_at,
                      "pass": acc >= args.threshold}))
    return 0 if acc >= args.threshold else 1


if __name__ == "__main__":
    sys.exit(main())
