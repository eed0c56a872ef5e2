#!/bin/bash
# Quality-evidence run for the DISTORTION-AWARE model (VERDICT r2 item 2):
# the paper's signature op (reference distortion_aware_ops.py, enabled per
# the commented intent at generator.py:14,18 / sunpose_net.py:11,16) trained
# end-to-end — sun pretrain + GAN, both with --da-conv true so every DA
# layer (Pallas fwd + custom-VJP bwd on TPU) is exercised by real
# optimization, then scored by skyhdr.cli.evaluate against the same
# held-out synthetic set as the plain-conv table in BASELINE.md.
#
# Epoch counts default to the plain-conv quality run (120/200) for a
# like-for-like comparison. Expect a long Mosaic compile phase up front
# (several unique kernel shapes x fwd/dk/dx).
set -euo pipefail
WORK=${1:-/tmp/qrun_da}
SUN_EPOCHS=${SUN_EPOCHS:-120}
GAN_EPOCHS=${GAN_EPOCHS:-200}
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
DATA="$WORK/dataset_128_32/tfrecord"

if [ ! -d "$DATA/train" ]; then
    # Same generator/seed as tools/quality_run.sh -> same distribution as
    # the plain-conv quality table.
    python tools/make_synth_dataset.py --out "$DATA" --n-train 2048 --n-test 256
fi

echo "=== sun pretrain DA ($SUN_EPOCHS epochs)"
python -m skyhdr.cli.train_sun --train true --dir "$DATA" --da-conv true \
    --epochs "$SUN_EPOCHS" --ckpt-every 20 --workdir "$WORK/da" \
    --outputimg-every 0 2>&1 | grep -E "Epoch [0-9]+0?:|restored" || true

echo "=== GAN DA f32 ($GAN_EPOCHS epochs)"
python -m skyhdr.cli.train --dir "$DATA" --da-conv true \
    --epochs "$GAN_EPOCHS" --ckpt-every 20 --workdir "$WORK/da" \
    2>&1 | grep -E "Epoch [0-9]+0?:|restored" || true

echo "=== evaluate: DA f32"
python -m skyhdr.cli.evaluate --dir "$DATA/test" --da-conv true \
    --workdir "$WORK/da"

echo "QUALITY RUN (DA) DONE"
