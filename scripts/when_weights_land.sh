#!/usr/bin/env bash
# Runbook for the day real weights / egress land (the standing
# env-blocked queue, VERDICT r4 item 6). Given a checkpoint directory it
# runs, in order:
#
#   1. real-weights Top-K parity vs the torch reference semantics
#      (scripts/parity_vs_torch.py — the acceptance metric, BASELINE
#      config 1 / reference infer.py:53-79);
#   2. golden-logit regeneration from the real checkpoint
#      (GOLDEN_REGEN=1 pytest tests/test_golden.py) — commit the diff
#      with a regen note per CLAUDE.md;
#   3. one judge-backed task scored with an instruction-following judge
#      (--judge hf:<judge ckpt>) AND with the exact-match stand-in, so
#      the score drift of the offline stand-in is measured, not assumed;
#   4. a downstream-adapter smoke (videoitg-eval --model internvl-chat)
#      proving the two-stage selection->answer path on the weights.
#
# Usage:
#   scripts/when_weights_land.sh CHECKPOINT_DIR [VIDEO] [JUDGE_CKPT]
#   scripts/when_weights_land.sh --selftest     # fixture end-to-end
#
# --selftest exercises every step on committed fixture checkpoints and a
# synthesized test video (no network): parity --selftest, golden regen
# into a scratch copy, hf: judge on a random tiny LM vs exact-match, and
# the adapter smoke on the tiny InternVL fixture. The suite pins the
# script's shape cheaply (test_cli.py::test_when_weights_land_script_-
# wellformed); the full selftest runs via
# VIDEOITG_RUN_RUNBOOK_SELFTEST=1 pytest tests/test_cli.py -k runbook
# (several minutes of CPU — out of the default suite).

set -euo pipefail
cd "$(dirname "$0")/.."

WORK="${WHEN_WEIGHTS_WORKDIR:-$(mktemp -d /tmp/when_weights.XXXX)}"
mkdir -p "$WORK"

log() { printf '\n=== [when-weights] %s ===\n' "$*"; }

if [[ "${1:-}" == "--selftest" ]]; then
    log "SELFTEST mode: fixture checkpoints, synthetic video, no egress"

    log "step 1/4: parity harness (synthesized full-layout checkpoint)"
    python scripts/parity_vs_torch.py --selftest \
        --out-json "$WORK/parity.json"

    log "step 2/4: golden regen (fixtures are seeded: bytes must not move)"
    cp -r tests/golden "$WORK/golden_backup"
    GOLDEN_REGEN=1 python -m pytest tests/test_golden.py -q
    if ! diff -rq tests/golden "$WORK/golden_backup" >/dev/null; then
        echo "[when-weights] FIXTURE REGEN CHANGED GOLDENS — restoring"
        rm -rf tests/golden && mv "$WORK/golden_backup" tests/golden
        exit 1
    fi
    rm -rf "$WORK/golden_backup"

    log "step 3/4: judge drift probe (hf: tiny LM vs exact-match)"
    python - <<'PY'
import json, os, tempfile
tmp = tempfile.mkdtemp()
from transformers import GPT2Config, GPT2LMHeadModel, LlamaTokenizerFast
from tests.fixtures.build import _fast_tokenizer
tok_obj, _ = _fast_tokenizer()
tok = LlamaTokenizerFast(tokenizer_object=tok_obj, unk_token="<unk>",
                         pad_token="<unk>")
tok.save_pretrained(tmp)
cfg = GPT2Config(n_layer=1, n_head=2, n_embd=32,
                 vocab_size=max(300, len(tok) + 8), n_positions=512)
GPT2LMHeadModel(cfg).save_pretrained(tmp)
from videoitg_tpu.eval.api import get_task
from videoitg_tpu.eval.judge import build_judge, set_default_judge
import videoitg_tpu.eval.tasks  # noqa: F401
task = get_task("activitynetqa")
doc = {"question_id": "q0", "question": "what color is the car",
       "answer": "red", "video_name": "v_x", "type": "3"}
drift = {}
for spec in (f"hf:{tmp}", "exact-match"):
    set_default_judge(build_judge(spec))
    rec = task.process_results(doc, "red")
    drift[spec.split(":")[0]] = rec
set_default_judge("exact-match")
print("[when-weights] judge drift probe:",
      json.dumps({k: {kk: vv for kk, vv in v.items()
                      if kk in ("pred", "score")}
                  for k, v in drift.items()}))
PY

    log "step 4/4: downstream adapter smoke (tiny InternVL fixture)"
    python - <<'PY'
import json, os, shutil, tempfile
tmp = tempfile.mkdtemp()
from tests.fixtures.build import build_tiny_internvl
ckpt = build_tiny_internvl(os.path.join(tmp, "ckpt"))
from videoitg_tpu.data.video import write_test_video
data_root = os.path.join(tmp, "data")
os.makedirs(os.path.join(data_root, "all_test"))
# activitynetqa layout: data_root/all_test/v_<video_name>.mp4
write_test_video(os.path.join(data_root, "all_test", "v_clip.mp4"),
                 width=64, height=48, n_frames=8)
docs = [{"question_id": "q0", "video_name": "clip",
         "question": "what color dominates", "answer": "red",
         "type": "3"}]
from videoitg_tpu.eval.api import get_adapter, get_task
import videoitg_tpu.eval.tasks  # noqa: F401
adapter = get_adapter("internvl-chat")(
    pretrained=ckpt, max_new_tokens=4, num_frame=2,
    data_root=data_root)
from videoitg_tpu.eval.harness import evaluate_task
report = evaluate_task(adapter, get_task("activitynetqa"), docs,
                       output_dir=os.path.join(tmp, "out"))
print("[when-weights] adapter smoke metrics:", report.metrics)
PY

    log "SELFTEST COMPLETE — all four steps ran end-to-end on fixtures"
    exit 0
fi

CKPT="${1:?usage: when_weights_land.sh CHECKPOINT_DIR [VIDEO] [JUDGE_CKPT] (or --selftest)}"
VIDEO="${2:-}"
JUDGE_CKPT="${3:-$CKPT}"

if [[ -z "$VIDEO" ]]; then
    VIDEO="$WORK/clip.mp4"
    log "no video given — synthesizing $VIDEO"
    python -c "from videoitg_tpu.data.video import write_test_video; \
write_test_video('$VIDEO', width=320, height=240, n_frames=64)"
fi

log "step 1/4: Top-K parity vs torch semantics on $CKPT"
python scripts/parity_vs_torch.py --checkpoint "$CKPT" --video "$VIDEO" \
    --prompt "Find the most relevant frames." \
    --topk 8 32 --out-json "$WORK/parity.json"
cat "$WORK/parity.json"

log "step 2/4: golden regen from the real checkpoint"
echo "Regenerating goldens — review + commit tests/golden/ with a regen note."
GOLDEN_REGEN=1 python -m pytest tests/test_golden.py -q

log "step 3/4: judge-backed task with hf:$JUDGE_CKPT vs exact-match"
videoitg-eval --model videoitg --model_args "checkpoint=$CKPT" \
    --tasks activitynetqa --limit 32 --judge "hf:$JUDGE_CKPT" \
    --output_path "$WORK/judge_hf" || true
videoitg-eval --model videoitg --model_args "checkpoint=$CKPT" \
    --tasks activitynetqa --limit 32 --judge exact-match \
    --output_path "$WORK/judge_em" || true
echo "Compare $WORK/judge_hf vs $WORK/judge_em and record the drift in PERF.md."

log "step 4/4: downstream adapter smoke"
videoitg-eval --model internvl-chat --model_args "pretrained=$CKPT" \
    --tasks activitynetqa --limit 4 --output_path "$WORK/adapter_smoke"

log "DONE — artifacts in $WORK"
