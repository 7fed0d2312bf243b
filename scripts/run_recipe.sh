#!/usr/bin/env bash
# One command from real Synapse data to the published eval table.
#
# Usage:
#   scripts/run_recipe.sh DATA_DIR [OUT_DIR]           # train (README.md:61
#                                                      # recipe) then eval
#   scripts/run_recipe.sh DATA_DIR OUT_DIR WEIGHTS     # eval only — WEIGHTS
#                                                      # is a reference .pth
#                                                      # (auto-converted) or
#                                                      # an orbax ckpt dir
#
# DATA_DIR must contain train_npz/ and test_vol_h5/ (the TransUNet
# preprocessed Synapse release). From the raw challenge download, build it
# first with:  python scripts/prepare_synapse.py --from-raw RAW_DIR DATA_DIR
#
# The eval log (OUT_DIR/test_log/eval.txt) prints per-case, per-class and
# mean DSC/HD95 lines byte-identical in format to the reference
# (test.py:116-122), so the comparison against the published table
# (reference README.md:95: mean DSC 82.24 / HD95 20.89) is copy-paste.
# Recipe knobs match reference README.md:61 + trainer.py:123-157: bs 16,
# base_lr 0.05, 500 epochs, SGD momentum 0.9 wd 1e-4, per-iteration cosine,
# 0.4·CE + 0.6·Dice, br_config 2. Override via env: BATCH, LR, EPOCHS.
set -euo pipefail
cd "$(dirname "$0")/.."

DATA_DIR=${1:?usage: run_recipe.sh DATA_DIR [OUT_DIR] [WEIGHTS]}
OUT_DIR=${2:-./output/recipe}
WEIGHTS=${3:-}
BATCH=${BATCH:-16}
LR=${LR:-0.05}
EPOCHS=${EPOCHS:-500}

test -d "$DATA_DIR/train_npz" || { echo "missing $DATA_DIR/train_npz" >&2; exit 1; }
test -d "$DATA_DIR/test_vol_h5" || { echo "missing $DATA_DIR/test_vol_h5" >&2; exit 1; }

if [ -z "$WEIGHTS" ]; then
    python -m transception_tpu.cli.train --dataset Synapse \
        --root_path "$DATA_DIR/train_npz" --test_path "$DATA_DIR/test_vol_h5" \
        --list_dir ./lists/lists_Synapse --br_config 2 \
        --batch_size "$BATCH" --base_lr "$LR" --max_epochs "$EPOCHS" \
        --eval_schedule reference --output_dir "$OUT_DIR"
    # Latest checkpoint from the run (orbax step_* dirs).
    WEIGHTS=$(ls -d "$OUT_DIR"/ckpt/step_* | sort | tail -1)
fi

python -m transception_tpu.cli.test --dataset Synapse --br_config 2 \
    --test_path "$DATA_DIR/test_vol_h5" --list_dir ./lists/lists_Synapse \
    --weight_pth "$WEIGHTS" --output_dir "$OUT_DIR"

echo
echo "== published-table comparison (reference README.md:95) =="
grep -E "Mean class|Testing performance" "$OUT_DIR/test_log/eval.txt" | tail -9
