"""Batched eval pipeline: TFRecord decode -> reconstruct -> PSNR/si-RMSE/EMD
over a test set (the BASELINE.json config 5 harness; metrics the IEEE paper
reports but the reference repo ships no code for).

Example:
  python -m skyhdr.cli.evaluate --dir dataset_128_32/tfrecord/test
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp

from skyhdr.cli.common import (add_common_flags, config_from_args, load_banks,
                               restore_model_vars)
from skyhdr.data.degradation import degrade_batch
from skyhdr.data.pipeline import PanoramaDataset
from skyhdr.train.engine import make_inference_fn
from skyhdr.train.evaluation import evaluate_batch


def main(argv=None):
    parser = argparse.ArgumentParser(description="evaluate on a test set")
    add_common_flags(parser)
    parser.add_argument("--sky", type=str, default=None)
    parser.add_argument("--sun", type=str, default=None)
    parser.add_argument("--max-batches", type=int, default=0)
    parser.add_argument("--render-dir", type=str, default=None,
                        help="also write tone-mapped PNG previews of "
                             "(input LDR, reconstruction, target) per batch")
    parser.add_argument("--weights-dtype", type=str, default="float32",
                        choices=("float32", "bfloat16"),
                        help="cast restored weights for serving (quality "
                             "impact of bf16-weight inference is measured "
                             "with exactly this flag — BASELINE.md)")
    args = parser.parse_args(argv)

    cfg = config_from_args(args)
    test_dir = args.dir or os.path.join(cfg.data.dataset_dir, "test")
    ds = PanoramaDataset(test_dir, imshape=cfg.model.imshape,
                         batch_size=cfg.data.batch_size, shuffle=False)
    banks = load_banks(cfg, args.dorf, train=False)

    gen_vars, sun_vars = restore_model_vars(cfg, args.workdir, sky=args.sky,
                                            sun=args.sun, seed=args.seed)

    if args.weights_dtype != "float32":
        from skyhdr.utils.params import cast_model_vars

        gen_vars = cast_model_vars(gen_vars, args.weights_dtype)
        sun_vars = cast_model_vars(sun_vars, args.weights_dtype)

    infer = make_inference_fn(cfg)

    @jax.jit
    def eval_one(gen_vars, sun_vars, key, hdr):
        hdr_t, ldr = degrade_batch(
            key, hdr, banks,
            jpeg_lo=cfg.data.jpeg_quality_lo, jpeg_hi=cfg.data.jpeg_quality_hi,
            sigma_s_scale=cfg.data.sigma_s_scale,
            sigma_c_scale=cfg.data.sigma_c_scale,
            chroma_subsample=cfg.data.jpeg_chroma_subsample)
        pred = infer(gen_vars, sun_vars, ldr)["y_final_lin"]
        return evaluate_batch(pred, hdr_t), (ldr, pred, hdr_t)

    key = jax.random.PRNGKey(args.seed)
    sums, count = {}, 0
    for i, batch in enumerate(ds):
        if args.max_batches and i >= args.max_batches:
            break
        key, sub = jax.random.split(key)
        metrics, (ldr, pred, hdr_t) = eval_one(
            gen_vars, sun_vars, sub, jnp.asarray(batch["hdr"]))
        for k, v in metrics.items():
            sums[k] = sums.get(k, 0.0) + float(jnp.sum(v))
        count += batch["hdr"].shape[0]
        if args.render_dir:
            import numpy as np

            from skyhdr.utils.vis import save_eval_panel, tonemap_for_display

            save_eval_panel(
                [np.asarray(ldr[0]),
                 tonemap_for_display(np.asarray(pred[0])),
                 tonemap_for_display(np.asarray(hdr_t[0]))],
                ["input LDR", "reconstruction (tone-mapped)",
                 "target (tone-mapped)"],
                os.path.join(args.render_dir, f"batch{i:04d}.png"),
            )

    result = {k: v / max(count, 1) for k, v in sums.items()}
    result["images"] = count
    print(json.dumps(result))


if __name__ == "__main__":
    main()
