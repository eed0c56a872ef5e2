#!/bin/bash
# End-to-end CLI drive per .claude/skills/verify/SKILL.md: dataset generation
# -> sun pretrain -> GAN train -> inference -> evaluate, on the tunneled TPU
# with tiny shapes. Exits nonzero on the first failing stage.
set -euo pipefail
WORK=${1:-/tmp/verify_e2e}
# Extra flags for the two TRAIN stages only (e.g. "--param-dtype bfloat16"
# drives the mixed-precision param storage end-to-end while inference/
# evaluate exercise the cross-dtype restore fallback WITHOUT the flag).
EXTRA_TRAIN_FLAGS=${EXTRA_TRAIN_FLAGS:-}
cd /root/repo
# NB: append, don't clobber — the axon TPU plugin registers via a
# sitecustomize reached through the pre-set PYTHONPATH (/root/.axon_site).
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

rm -rf "$WORK"
mkdir -p "$WORK"

python - "$WORK" <<'EOF'
import os, sys
import numpy as np
sys.path.insert(0, "/root/repo")
from skyhdr.utils.io import write_hdr
import pandas as pd

root = os.path.join(sys.argv[1], "laval")
rng = np.random.default_rng(0)
dates = ["20200101", "20200102"]
times = ["090000", "103000", "120000", "133000"]
for date in dates:
    rows = []
    for j, t in enumerate(times):
        d = os.path.join(root, "envmap", date, t)
        os.makedirs(d, exist_ok=True)
        img = (rng.uniform(0, 1, size=(64, 128, 3)) ** 2 * 3).astype(np.float32)
        img[20 + j, 40] = 500.0  # sun spike
        write_hdr(os.path.join(d, "envmap.hdr"), img)
        rows.append({
            "Datetime": f"{date[:4]}-{date[4:6]}-{date[6:8]} {t[:2]}:{t[2:4]}:{t[4:6]}",
            "Sun elevation": np.deg2rad(30.0 + 5 * j),
            "Sun azimuth": np.deg2rad(120.0 + 20 * j),
        })
    os.makedirs(os.path.join(root, "csv_day"), exist_ok=True)
    pd.DataFrame(rows).to_csv(os.path.join(root, "csv_day", date), index=False)

# A couple of LDR inputs for the inference stage.
ldr_dir = os.path.join(sys.argv[1], "ldr_in")
os.makedirs(ldr_dir, exist_ok=True)
from PIL import Image
for i in range(2):
    arr = (rng.uniform(0, 1, size=(16, 64, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(os.path.join(ldr_dir, f"in{i}.jpg"))
print("synth DB ready")
EOF

echo "=== dataset_generator"
python -m skyhdr.cli.dataset_generator --dir "$WORK/laval" --out "$WORK" \
    --imheight 16 --imwidth 64 --img-bias 1e-6 --train-split 6 --envmap-ext hdr

echo "=== train_sun"
python -m skyhdr.cli.train_sun --train true --dir "$WORK/dataset_64_16/tfrecord" \
    --imheight 16 --imwidth 64 --batchsize 2 --epochs 2 --ckpt-every 1 \
    --workdir "$WORK" --outputimg-every 1 $EXTRA_TRAIN_FLAGS
# Per-epoch dump set matches the reference (train_sun.py:353-373).
for d in pred sungt sun_cam1 sun_cam2 sun_cam3; do
    test -f "$WORK/outputImg/SUN/val/$d/epoch2.png" || { echo "missing $d dump"; exit 1; }
done
ls "$WORK"/outputImg/SUN/groundTruth/*.hdr >/dev/null || { echo "missing GT HDR dump"; exit 1; }

echo "=== train (GAN)"
python -m skyhdr.cli.train --dir "$WORK/dataset_64_16/tfrecord" \
    --imheight 16 --imwidth 64 --batchsize 2 --epochs 1 --ckpt-every 1 \
    --workdir "$WORK" $EXTRA_TRAIN_FLAGS

echo "=== inference"
python -m skyhdr.cli.inference --indir "$WORK/ldr_in" --outdir "$WORK/hdr_out" \
    --imheight 16 --imwidth 64 --workdir "$WORK"

echo "=== evaluate"
python -m skyhdr.cli.evaluate --dir "$WORK/dataset_64_16/tfrecord/test" \
    --imheight 16 --imwidth 64 --batchsize 2 --workdir "$WORK"

echo "=== check HDR output decodes"
python - "$WORK" <<'EOF'
import glob, sys
sys.path.insert(0, "/root/repo")
import numpy as np
from skyhdr.utils.io import read_hdr
outs = glob.glob(sys.argv[1] + "/hdr_out/*.hdr")
assert outs, "no .hdr outputs"
for p in outs:
    img = read_hdr(p)
    assert np.all(np.isfinite(img)), p
    print(p, "max", float(img.max()))
EOF

echo "E2E DRIVE OK"
