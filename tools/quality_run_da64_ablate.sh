#!/bin/bash
# One-knob quality ablation of the low-precision trainer knobs at the
# DA 64x256 scale (VERDICT r4 item 5): the confounded evidence row
# (BASELINE.md quality table, bf16 moments + bf16 grad staging together,
# -1.30 dB on a single run) cannot attribute the cost to either knob.
# This script trains THREE 60-epoch GAN stages from ONE shared 60-epoch
# SUN pretrain checkpoint on the SAME seeded synthetic 64x256 dataset:
#   da_f32   - both knobs f32 (the paired control row)
#   da_opt   - opt_state_dtype=bfloat16 only
#   da_grad  - grad_dtype=bfloat16 only
# and scores each with skyhdr.cli.evaluate. Rows are directly comparable
# to each other (identical init, data order, and loss config; only the
# named knob differs). ckpt-every 60: one ~5-min 6.5 GB tunnel save per
# stage instead of three (BASELINE.md "Tunnel bandwidth discipline").
set -euo pipefail
WORK=${1:-/tmp/qrun_da64}
SUN_EPOCHS=${SUN_EPOCHS:-60}
GAN_EPOCHS=${GAN_EPOCHS:-60}
BATCH=${BATCH:-8}
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
DATA="$WORK/dataset_256_64/tfrecord"
FLAGS=(--imheight 64 --imwidth 256 --batchsize "$BATCH" --da-conv true
       --compilation-cache "${QCACHE:-/root/repo/.xla_cache}")

if [ ! -d "$DATA/train" ]; then
    python tools/make_synth_dataset.py --out "$DATA" --imheight 64 \
        --imwidth 256 --n-train 2048 --n-test 256
fi

if [ ! -d "$WORK/da/checkpoints/SUN" ]; then
    echo "=== sun pretrain DA 64x256 ($SUN_EPOCHS epochs, b$BATCH)"
    python -m skyhdr.cli.train_sun --train true --dir "$DATA" "${FLAGS[@]}" \
        --epochs "$SUN_EPOCHS" --ckpt-every 60 --workdir "$WORK/da" \
        --outputimg-every 0 > "$WORK/sun.log" 2>&1 \
        || { echo "SUN STAGE FAILED:"; tail -30 "$WORK/sun.log"; exit 1; }
    grep -E "Epoch ([0-9]*[05]|[0-9]):|restored" "$WORK/sun.log" || true
fi

run_gan () {  # $1 = stage name, remaining args = extra train flags
    local name=$1; shift
    echo "=== GAN DA 64x256 stage '$name' ($GAN_EPOCHS epochs, b$BATCH) $*"
    python -m skyhdr.cli.train --dir "$DATA" "${FLAGS[@]}" \
        --epochs "$GAN_EPOCHS" --ckpt-every 60 --workdir "$WORK/$name" \
        --sun "$WORK/da/checkpoints/SUN" "$@" \
        > "$WORK/$name.log" 2>&1 \
        || { echo "GAN STAGE '$name' FAILED:"; tail -30 "$WORK/$name.log"; exit 1; }
    grep -E "Epoch ([0-9]*[05]|[0-9]):|restored" "$WORK/$name.log" || true
    echo "=== evaluate: $name"
    python -m skyhdr.cli.evaluate --dir "$DATA/test" "${FLAGS[@]}" \
        --workdir "$WORK/$name" | tee "$WORK/$name.eval"
}

run_gan da_f32
run_gan da_opt  --opt-state-dtype bfloat16
run_gan da_grad --grad-dtype bfloat16

echo "QUALITY RUN (DA 64x256 one-knob ablation) DONE"
