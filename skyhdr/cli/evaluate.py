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


def _iter_real_batches(real_dir: str, imshape, batch_size: int):
    """Batches from cli.convert_real_eval records: real {ldr, hdr} pairs,
    host-resized to the model resolution. ldr -> RGB [0,1]; hdr -> RGB with
    the training-time DrTMO mean normalization (data/pipeline.py
    prepare_sample) so PSNR is computed in the scale the model was trained
    in (si-RMSE is scale-free either way)."""
    import numpy as np

    from skyhdr.data.records import read_tfrecord_examples

    h, w, _ = imshape

    def resize(img):
        import cv2

        return cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)

    def scalar(ex, key, default_key=None):
        v = ex.get(key) if default_key is None else ex.get(key, ex[default_key])
        return int(np.asarray(v).reshape(-1)[0])

    ldrs, hdrs = [], []
    for ex in read_tfrecord_examples(real_dir):
        hh, hw = scalar(ex, "height"), scalar(ex, "width")
        lh = scalar(ex, "ldr_height", "height")
        lw = scalar(ex, "ldr_width", "width")
        hdr = np.frombuffer(ex["hdr"], np.float32).reshape(hh, hw, 3)
        ldr = np.frombuffer(ex["ldr"], np.uint8).reshape(lh, lw, 3)
        hdr = resize(hdr[..., ::-1])  # stored BGR (cv2 order)
        ldr = resize(ldr[..., ::-1].astype(np.float32) / 255.0)
        hdr = 0.5 * hdr / (hdr.mean() + 1e-6)
        ldrs.append(ldr)
        hdrs.append(hdr)
        if len(ldrs) == batch_size:
            yield np.stack(ldrs), np.stack(hdrs), batch_size
            ldrs, hdrs = [], []
    if ldrs:
        # Pad the tail to batch_size (repeat the last sample) so the jitted
        # eval_real sees ONE shape — a partial final batch would recompile,
        # a 10-60 s remote compile on this tunnel (cli/inference.py pads its
        # tail group for the same reason). The pad rows are masked out of
        # the metric sums by the yielded count.
        n = len(ldrs)
        pad = batch_size - n
        ldrs += [ldrs[-1]] * pad
        hdrs += [hdrs[-1]] * pad
        yield np.stack(ldrs), np.stack(hdrs), n


def main(argv=None):
    parser = argparse.ArgumentParser(description="evaluate on a test set")
    add_common_flags(parser)
    parser.add_argument("--sky", type=str, default=None)
    parser.add_argument("--sun", type=str, default=None)
    parser.add_argument("--real-dir", type=str, default=None,
                        help="evaluate on REAL captured pairs from "
                             "cli.convert_real_eval ({ldr, hdr} records) "
                             "instead of degrading a synthetic test split: "
                             "the model predicts from the real LDR and is "
                             "scored against the real HDR GT")
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
    if args.real_dir:
        ds = banks = None
    else:
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

    @jax.jit
    def eval_real(gen_vars, sun_vars, ldr, hdr_t):
        pred = infer(gen_vars, sun_vars, ldr)["y_final_lin"]
        return evaluate_batch(pred, hdr_t), pred

    def batches():
        if args.real_dir:
            for ldr, hdr_t, n in _iter_real_batches(
                    args.real_dir, cfg.model.imshape, cfg.data.batch_size):
                yield ("real", ldr, hdr_t, n)
        else:
            for batch in ds:
                yield ("synth", batch["hdr"], None, batch["hdr"].shape[0])

    key = jax.random.PRNGKey(args.seed)
    sums, count = {}, 0
    for i, (kind, a, b, n) in enumerate(batches()):
        if args.max_batches and i >= args.max_batches:
            break
        if kind == "real":
            ldr, hdr_t = jnp.asarray(a), jnp.asarray(b)
            metrics, pred = eval_real(gen_vars, sun_vars, ldr, hdr_t)
        else:
            key, sub = jax.random.split(key)
            metrics, (ldr, pred, hdr_t) = eval_one(
                gen_vars, sun_vars, sub, jnp.asarray(a))
        for k, v in metrics.items():
            # v is a per-image vector; sum only the n real rows (the real
            # path's tail batch is padded to a fixed shape).
            sums[k] = sums.get(k, 0.0) + float(jnp.sum(v[:n]))
        count += n
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
