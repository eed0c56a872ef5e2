"""Real-outdoor eval-set converter (reference convert_to_tf_record.py):
pairs outdoor_real_gt/*.exr with outdoor_real_input/*.jpg, crops the top
half (sky dome), writes {ldr, hdr} TFRecords.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from skyhdr.data.records import write_tfrecord


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="convert real outdoor LDR/HDR pairs to eval TFRecords")
    parser.add_argument("--gt-dir", type=str, default="outdoor_real_gt")
    parser.add_argument("--input-dir", type=str, default="outdoor_real_input")
    parser.add_argument("--out", type=str, default="outdoor_real_tfrecord")
    args = parser.parse_args(argv)

    import cv2

    os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "true")
    os.makedirs(args.out, exist_ok=True)

    gts = sorted(glob.glob(os.path.join(args.gt_dir, "*.exr")))
    ldrs = sorted(glob.glob(os.path.join(args.input_dir, "*.jpg")))
    assert len(gts) == len(ldrs), (len(gts), len(ldrs))

    for gt_path, ldr_path in zip(gts, ldrs):
        hdr = cv2.imread(gt_path, cv2.IMREAD_UNCHANGED)
        ldr = cv2.imread(ldr_path, cv2.IMREAD_COLOR)
        # Top-half crop = the sky dome (reference convert_to_tf_record.py:49-50).
        hdr = hdr[: hdr.shape[0] // 2].astype(np.float32)
        ldr = ldr[: ldr.shape[0] // 2]
        name = os.path.splitext(os.path.basename(gt_path))[0]
        out_path = os.path.join(args.out, name + ".tfrecord")
        write_tfrecord(out_path, [{
            "ldr": np.ascontiguousarray(ldr).tobytes(),
            "hdr": np.ascontiguousarray(hdr).tobytes(),
            "height": float(hdr.shape[0]),
            "width": float(hdr.shape[1]),
        }])
        print("wrote", out_path)


if __name__ == "__main__":
    main()
