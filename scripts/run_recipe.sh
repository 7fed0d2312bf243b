#!/bin/bash
# Full published-recipe training run on synthetic data (VERDICT r2 #2):
# bs 24, 500 epochs, cosine LR, reference eval/checkpoint cadence, TB on.
# ~92 steps/epoch x 46k steps; used to produce the measured sustained
# throughput + total wall time row in README and to prove auto-resume
# (kill mid-run, restart with the same command — resume=True by default).
#
# Usage: scripts/run_recipe.sh <output_dir>
set -e
OUT=${1:-/root/repo/runs/r3_recipe}
mkdir -p "$OUT"
cd /root/repo
exec python -m transception_tpu.cli.train \
    --dataset synthetic \
    --output_dir "$OUT" \
    --batch_size 24 \
    --base_lr 0.05 \
    --max_epochs 500 \
    --eval_schedule reference \
    --eval_interval 20 \
    --num_workers 4
