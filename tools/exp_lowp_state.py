"""Measure bf16 optimizer-state / gradient-staging on the DA 64x256 train
step (TrainConfig.opt_state_dtype / grad_dtype). Profile evidence
(2026-08-19): the fc1 dW+RMSprop fusion alone is 12.5 ms/step at b32 —
the f32 streaming floor of its 10.5 GB dW+moment+param traffic; narrowing
moments and gradient staging attacks exactly that.

Usage: python tools/exp_lowp_state.py [--batch 32] [--iters 8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench helpers: honest chained timing)
from skyhdr.config import Config, DataConfig, ModelConfig, TrainConfig  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--only", type=str, default=None,
                    help="run one variant: f32 | bf16state | bf16both "
                         "(e.g. large batches where the f32 state cannot "
                         "fit on the 16 GB chip)")
    ap.add_argument("--compute-dtype", type=str, default="float32",
                    choices=("float32", "bfloat16"),
                    help="ModelConfig.compute_dtype for every variant; "
                         "under bfloat16 the bf16-param variants need no "
                         "materialized upcast pass (the f32-compute "
                         "convert_element_type fusion is 18.6 ms/step at "
                         "DA 64x256 b64 — see BASELINE.md)")
    args = ap.parse_args()

    bench._enable_compilation_cache()
    variants = [
        ("f32 state, f32 grads", "float32", "float32", "float32"),
        ("bf16 opt state", "bfloat16", "float32", "float32"),
        ("bf16 opt state + bf16 grads", "bfloat16", "bfloat16", "float32"),
        ("bf16 params (f32 master)", "float32", "float32", "bfloat16"),
        ("bf16 params + opt + grads", "bfloat16", "bfloat16", "bfloat16"),
    ]
    keys = {"f32": 0, "bf16state": 1, "bf16both": 2, "bf16params": 3,
            "bf16all": 4}
    if args.only is not None:
        variants = [variants[keys[args.only]]]
    for name, osd, gd, pd in variants:
        cfg = Config(
            model=ModelConfig(im_height=args.height, im_width=args.width,
                              use_da_conv=True,
                              compute_dtype=args.compute_dtype),
            data=DataConfig(batch_size=args.batch),
            train=TrainConfig(opt_state_dtype=osd, grad_dtype=gd,
                              param_dtype=pd),
        )
        r = bench.bench_train_step(cfg, iters=args.iters,
                                   repeats=args.repeats)
        print(f"{name:32s}: {r['ms']:.1f} ms/step "
              f"({r['panoramas_per_s']:.1f} pano/s, mfu {r['mfu']:.3f}) "
              f"spread {r['spread_ms']}", flush=True)


if __name__ == "__main__":
    main()
