#!/bin/bash
# Quality evidence for the low-precision trainer knobs at the scale they
# target (TrainConfig.opt_state_dtype / grad_dtype = bfloat16; see
# BASELINE.md "bf16 optimizer state ... perf-NEUTRAL"): re-runs ONLY the
# GAN stage of tools/quality_run_da64.sh from the SAME 60-epoch SUN
# pretrain checkpoint and the SAME synthetic 64x256 dataset, with bf16
# RMSprop moments + bf16 gradient staging, then scores it with
# skyhdr.cli.evaluate for a row directly comparable to the published
# f32-state row (BASELINE.md quality table).
set -euo pipefail
WORK=${1:-/tmp/qrun_da64}
GAN_EPOCHS=${GAN_EPOCHS:-60}
BATCH=${BATCH:-8}
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
DATA="$WORK/dataset_256_64/tfrecord"
FLAGS=(--imheight 64 --imwidth 256 --batchsize "$BATCH" --da-conv true
       --compilation-cache "${QCACHE:-/root/repo/.xla_cache}")

test -d "$DATA/train" || { echo "missing $DATA (run quality_run_da64.sh first)"; exit 1; }
test -d "$WORK/da/checkpoints/SUN" || { echo "missing SUN pretrain ckpt"; exit 1; }

echo "=== GAN DA 64x256, bf16 opt state + bf16 grad staging ($GAN_EPOCHS epochs, b$BATCH)"
python -m skyhdr.cli.train --dir "$DATA" "${FLAGS[@]}" \
    --epochs "$GAN_EPOCHS" --ckpt-every 20 --workdir "$WORK/da_lowp" \
    --sun "$WORK/da/checkpoints/SUN" \
    --opt-state-dtype bfloat16 --grad-dtype bfloat16 \
    > "$WORK/gan_lowp.log" 2>&1 \
    || { echo "GAN STAGE FAILED:"; tail -30 "$WORK/gan_lowp.log"; exit 1; }
grep -E "Epoch ([0-9]*[05]|[0-9]):|restored" "$WORK/gan_lowp.log" || true

echo "=== evaluate: DA 64x256 bf16-state"
python -m skyhdr.cli.evaluate --dir "$DATA/test" "${FLAGS[@]}" \
    --workdir "$WORK/da_lowp"

echo "QUALITY RUN (DA 64x256 lowp state) DONE"
