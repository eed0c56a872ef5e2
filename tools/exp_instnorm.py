"""Measure the fused InstanceNorm Pallas kernel on the real TPU.

Compares ModelConfig.fused_instance_norm on/off on the production configs
using bench.py's integrity-hardened timers (chained distinct inputs, host
read barriers, compute-floor rejection). Run on a QUIET TPU — the remote
compile helper serializes Mosaic compiles with every other process.

  python tools/exp_instnorm.py [stage ...]    # default: all stages
"""

import dataclasses
import sys

sys.path.insert(0, "/root/repo")

from bench import (_enable_compilation_cache, bench_inference,
                   bench_train_step)
from skyhdr.config import Config, DataConfig, ModelConfig


def _cfg(fused, **model_kw):
    batch = model_kw.pop("batch_size", 32)
    return Config(model=ModelConfig(fused_instance_norm=fused, **model_kw),
                  data=DataConfig(batch_size=batch))


STAGES = {
    "train_bf16_b128": lambda f: bench_train_step(
        _cfg(f, compute_dtype="bfloat16", batch_size=128), iters=8),
    "train_f32_b32": lambda f: bench_train_step(_cfg(f)),
    "infer_b32": lambda f: bench_inference(_cfg(f), 32),
    "infer_b1": lambda f: bench_inference(_cfg(f), 1, iters=50),
    "da64_train_b32": lambda f: bench_train_step(
        _cfg(f, im_height=64, im_width=256, use_da_conv=True,
             batch_size=32), iters=6),
}


def main():
    _enable_compilation_cache()
    names = sys.argv[1:] or list(STAGES)
    for name in names:
        for fused in (False, True):
            try:
                res = STAGES[name](fused)
            except Exception as e:
                print(f"{name} fused={fused}: FAILED "
                      f"{type(e).__name__}: {str(e)[:300]}", flush=True)
                continue
            print(f"{name} fused={fused}: {res['ms']:.3f} ms "
                  f"({res['panoramas_per_s']:.1f} pano/s, "
                  f"mfu {res.get('mfu') or 0:.3f}, "
                  f"spread {res['spread_ms']})", flush=True)


if __name__ == "__main__":
    main()
