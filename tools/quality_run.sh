#!/bin/bash
# Quality-evidence run (BASELINE.md): two-stage training on the synthetic
# Laval-like set (tools/make_synth_dataset.py), f32 and bf16 GAN stages from
# the same SUN pretrain, then PSNR/si-RMSE/EMD through skyhdr.cli.evaluate
# (plus an untrained floor). Runs on the tunneled TPU; several hours of
# wall at default sizes.
set -euo pipefail
WORK=${1:-/tmp/qrun}
SUN_EPOCHS=${SUN_EPOCHS:-120}
GAN_EPOCHS=${GAN_EPOCHS:-200}
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
DATA="$WORK/dataset_128_32/tfrecord"
# Persistent XLA cache: reruns (and the bench's 32x128 graphs) skip the
# 10-60 s/graph remote compiles.
CACHE=(--compilation-cache "${QCACHE:-/root/repo/.xla_cache}")

if [ ! -d "$DATA/train" ]; then
    python tools/make_synth_dataset.py --out "$DATA" --n-train 2048 --n-test 256
fi

echo "=== sun pretrain ($SUN_EPOCHS epochs)"
python -m skyhdr.cli.train_sun --train true --dir "$DATA" \
    --epochs "$SUN_EPOCHS" --ckpt-every 20 --workdir "$WORK/f32" "${CACHE[@]}" \
    --outputimg-every 0 2>&1 | grep -E "Epoch (1|.*0):|Error|Traceback|assert"

echo "=== GAN f32 ($GAN_EPOCHS epochs)"
python -m skyhdr.cli.train --dir "$DATA" --epochs "$GAN_EPOCHS" \
    --ckpt-every 20 --workdir "$WORK/f32" "${CACHE[@]}" 2>&1 | grep -E "Epoch .*0:|restored|Error|Traceback|assert"

echo "=== GAN bf16 ($GAN_EPOCHS epochs)"
mkdir -p "$WORK/bf16/checkpoints"
python -m skyhdr.cli.train --dir "$DATA" --epochs "$GAN_EPOCHS" \
    --ckpt-every 20 --workdir "$WORK/bf16" --compute-dtype bfloat16 "${CACHE[@]}" \
    --sun "$WORK/f32/checkpoints/SUN" 2>&1 | grep -E "Epoch .*0:|restored|Error|Traceback|assert"

echo "=== evaluate: untrained floor"
mkdir -p "$WORK/untrained"
python -m skyhdr.cli.evaluate --dir "$DATA/test" --workdir "$WORK/untrained" "${CACHE[@]}"

echo "=== evaluate: f32"
python -m skyhdr.cli.evaluate --dir "$DATA/test" --workdir "$WORK/f32" "${CACHE[@]}"

echo "=== evaluate: bf16 (weights trained bf16, eval graph f32)"
python -m skyhdr.cli.evaluate --dir "$DATA/test" --workdir "$WORK/bf16" "${CACHE[@]}"

echo "QUALITY RUN DONE"
