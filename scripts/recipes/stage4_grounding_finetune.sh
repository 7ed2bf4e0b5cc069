#!/bin/bash
# Stage 4/4 — THE VideoITG grounding finetune (plain template, BCE loss,
# out_proj at 10x LR). TPU counterpart of
# /root/reference/scripts/videoitg/finetune-qwen2-7b-grounding.sh:
# 1024 frames @ 1 fps, vision_token_num 16384 (set in the checkpoint's
# videoitg_tpu_config.json), lr 2e-5 + out_proj 2e-4, cosine, warmup 0.05,
# 1 epoch. Reference scale: 128x A100-80G, ~4 h (README.md:166); on TPU
# pick the mesh with --dp/--tp and scale --gradient-accumulation-steps.
set -euo pipefail
BASE=${BASE:-./checkpoints/stage3-video-sft}
DATA=${DATA:-./data/video_itg_data.json}   # {"video","question","clip_num"}
VIDEOS=${VIDEOS:-./data}
OUT=${OUT:-./checkpoints/stage4-grounding}

videoitg-train \
    --model "$BASE" \
    --objective grounding \
    --data-path "$DATA" --image-folder "$VIDEOS" \
    --video-frames 1024 --fps 1 \
    --learning-rate 2e-5 --out-proj-lr 2e-4 \
    --num-train-epochs 1 \
    --per-device-train-batch-size 1 \
    --gradient-accumulation-steps 1 \
    --weight-decay 0 --warmup-ratio 0.05 --lr-scheduler-type cosine \
    --save-steps 500 --save-total-limit 2 --logging-steps 1 \
    --output-dir "$OUT" "$@"
