#!/bin/bash
# Stage 1/4 — projector pretrain on caption pairs (BLIP-LAION-558k style).
# TPU counterpart of /root/reference/scripts/videoitg/pretrain-qwen2-7b.sh:
# plain template, adapter-only training, lr 1e-3, cosine, warmup 0.03.
# DeepSpeed ZeRO-1 -> GSPMD mesh (--dp/--tp); grad ckpt always on (remat).
set -euo pipefail
BASE=${BASE:-/ckpts/qwen2-7b-with-siglip}   # HF-format starting point
DATA=${DATA:-./data/blip_laion_cc_sbu_558k.json}
IMAGES=${IMAGES:-./data/llava_pretrain_images}
OUT=${OUT:-./checkpoints/stage1-pretrain}

videoitg-train \
    --model "$BASE" \
    --objective vlm --conv-template plain \
    --data-path "$DATA" --image-folder "$IMAGES" \
    --tune-projector-only --mm-projector-lr 1e-3 \
    --learning-rate 1e-3 \
    --video-frames 64 --fps 1 \
    --num-train-epochs 1 \
    --per-device-train-batch-size 2 \
    --gradient-accumulation-steps 1 \
    --weight-decay 0 --warmup-ratio 0.03 --lr-scheduler-type cosine \
    --save-steps 500 --save-total-limit 1 --logging-steps 1 \
    --output-dir "$OUT" "$@"
