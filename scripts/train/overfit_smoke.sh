#!/usr/bin/env bash
# On-chip overfit smoke (VERDICT r2 #6): 2B tier learns a synthetic
# 32-video grounding set to Top-1 > 0.9 with one mid-run kill + resume.
# Run log: docs/PERF.md "Training that demonstrably learns".
set -e
cd "$(dirname "$0")/../.."
exec python scripts/train/overfit_smoke.py "$@"
