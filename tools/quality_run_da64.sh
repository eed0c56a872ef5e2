#!/bin/bash
# Scale-up training evidence: the DISTORTION-AWARE model at the 64x256
# config (BASELINE.json's named scale-up resolution) trained end-to-end —
# sun pretrain + GAN, every DA layer on the Pallas fwd + custom-VJP bwd
# kernels at the 64x256 shapes — then scored by skyhdr.cli.evaluate against
# a held-out synthetic set, next to the untrained floor at the same
# resolution.
#
# Batch 8 everywhere: the 64x256 sunpose FCs are 3.2 GB f32
# (reference sunpose_net.py:36 h*w-wide layers), so params + Adam moments
# already hold ~9.6 GB of the 16 GB HBM; b8 keeps activations comfortable.
# Epoch counts default to 60/60 — convergence evidence, not absolute
# parity (BASELINE.md "Quality evidence" caveats apply).
set -euo pipefail
WORK=${1:-/tmp/qrun_da64}
SUN_EPOCHS=${SUN_EPOCHS:-60}
GAN_EPOCHS=${GAN_EPOCHS:-60}
BATCH=${BATCH:-8}
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
DATA="$WORK/dataset_256_64/tfrecord"
# Persistent XLA cache: the DA 64x256 GAN step is a ~25 min remote compile;
# the cache makes restarts of this long run (session kills, OOM retries)
# resume in seconds instead. Defaults to the repo-wide cache so the
# 64x256 graphs already compiled by bench.py / the batch probes are reused;
# override with QCACHE for an isolated cache.
FLAGS=(--imheight 64 --imwidth 256 --batchsize "$BATCH" --da-conv true
       --compilation-cache "${QCACHE:-/root/repo/.xla_cache}")

if [ ! -d "$DATA/train" ]; then
    python tools/make_synth_dataset.py --out "$DATA" --imheight 64 \
        --imwidth 256 --n-train 2048 --n-test 256
fi

echo "=== untrained floor at 64x256 (fresh workdir, no checkpoints)"
python -m skyhdr.cli.evaluate --dir "$DATA/test" "${FLAGS[@]}" \
    --workdir "$WORK/floor"

# Full per-stage logs are kept (a `cmd | grep || true` pipeline would
# swallow a crash's traceback AND its exit code — that pattern hid a real
# OOM once); only the epoch-line summary goes to stdout.
echo "=== sun pretrain DA 64x256 ($SUN_EPOCHS epochs, b$BATCH)"
python -m skyhdr.cli.train_sun --train true --dir "$DATA" "${FLAGS[@]}" \
    --epochs "$SUN_EPOCHS" --ckpt-every 20 --workdir "$WORK/da" \
    --outputimg-every 0 > "$WORK/sun.log" 2>&1 \
    || { echo "SUN STAGE FAILED:"; tail -30 "$WORK/sun.log"; exit 1; }
grep -E "Epoch ([0-9]*[05]|[0-9]):|restored" "$WORK/sun.log" || true

echo "=== GAN DA 64x256 f32 ($GAN_EPOCHS epochs, b$BATCH)"
python -m skyhdr.cli.train --dir "$DATA" "${FLAGS[@]}" \
    --epochs "$GAN_EPOCHS" --ckpt-every 20 --workdir "$WORK/da" \
    > "$WORK/gan.log" 2>&1 \
    || { echo "GAN STAGE FAILED:"; tail -30 "$WORK/gan.log"; exit 1; }
grep -E "Epoch ([0-9]*[05]|[0-9]):|restored" "$WORK/gan.log" || true

echo "=== evaluate: DA 64x256 f32"
python -m skyhdr.cli.evaluate --dir "$DATA/test" "${FLAGS[@]}" \
    --workdir "$WORK/da"

echo "QUALITY RUN (DA 64x256) DONE"
