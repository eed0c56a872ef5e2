"""Production inference (reference inference.py): LDR JPG/PNG panoramas ->
reconstructed .hdr radiance maps.

Unlike the reference — which rebuilds and restores both models for EVERY
image (inference.py:50-79, flagged in SURVEY.md §3.3) — models are built and
restored once and the jitted forward is reused across images.

Example:
  python -m skyhdr.cli.inference --indir ldr_images/ --outdir out/
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np
import jax.numpy as jnp

from skyhdr.cli.common import (add_common_flags, config_from_args,
                               restore_model_vars)
from skyhdr.train.engine import make_inference_fn
from skyhdr.utils.io import write_hdr


def _imread01(path: str) -> np.ndarray:
    """Read an 8-bit image to float RGB in [0, 1]."""
    try:
        import cv2

        img = cv2.imread(path, cv2.IMREAD_COLOR)
        return img[..., ::-1].astype(np.float32) / 255.0
    except ImportError:
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"),
                          np.float32) / 255.0


def main(argv=None):
    parser = argparse.ArgumentParser(description="LDR -> HDR inference")
    add_common_flags(parser)
    parser.add_argument("--indir", type=str, required=True)
    parser.add_argument("--outdir", type=str, default="inference_out")
    parser.add_argument("--sky", type=str, default=None)
    parser.add_argument("--sun", type=str, default=None)
    parser.add_argument("--weights-dtype", type=str, default="float32",
                        choices=("float32", "bfloat16"),
                        help="cast restored weights for serving; bfloat16 "
                             "halves HBM weight streaming (the dominant "
                             "cost at 64x256 — BASELINE.md)")
    parser.add_argument("--batch", type=int, default=1,
                        help="images per device dispatch. b1 serving is a "
                             "documented per-op latency floor (~0.9 ms "
                             "device + dispatch, BASELINE.md); batching "
                             "amortizes it to ~0.2 ms/panorama at 32. The "
                             "final partial group is padded to the batch "
                             "size (one compiled graph), so its last image "
                             "is recomputed up to batch-1 times — padded "
                             "outputs are not cost-free; default 1 keeps "
                             "compile time minimal for small folders")
    args = parser.parse_args(argv)

    cfg = config_from_args(args)

    # Validate inputs BEFORE building/restoring models (the reference's
    # input check was a no-op tuple-assert, inference.py:133, and models
    # were rebuilt per image; we fail fast instead).
    paths = sorted(glob.glob(os.path.join(args.indir, "*.jpg"))
                   + glob.glob(os.path.join(args.indir, "*.jpeg"))
                   + glob.glob(os.path.join(args.indir, "*.png")))
    if not paths:
        raise SystemExit(
            f"error: no .jpg/.jpeg/.png images found under {args.indir!r}")
    os.makedirs(args.outdir, exist_ok=True)

    gen_vars, sun_vars = restore_model_vars(cfg, args.workdir, sky=args.sky,
                                            sun=args.sun, seed=args.seed)

    if args.weights_dtype != "float32":
        from skyhdr.utils.params import cast_model_vars

        gen_vars = cast_model_vars(gen_vars, args.weights_dtype)
        sun_vars = cast_model_vars(sun_vars, args.weights_dtype)

    infer = make_inference_fn(cfg)

    bsz = max(1, args.batch)
    for start in range(0, len(paths), bsz):
        group = paths[start:start + bsz]
        imgs = [_imread01(p) for p in group]
        # Pad the tail group by repeating the last image so every dispatch
        # reuses the ONE compiled batch shape (padded outputs are dropped).
        batch = np.stack(imgs + [imgs[-1]] * (bsz - len(group)))
        out = infer(gen_vars, sun_vars, jnp.asarray(batch))
        hdrs = np.asarray(out["y_final_lin"][:len(group)])
        for path, hdr in zip(group, hdrs):
            name = os.path.splitext(os.path.basename(path))[0]
            out_path = os.path.join(args.outdir, name + ".hdr")
            write_hdr(out_path, hdr)
            print("wrote", out_path)


if __name__ == "__main__":
    main()
