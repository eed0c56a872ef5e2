"""Measure bf16-weight serving vs f32 weights (bench_inference protocol)."""
import sys

import jax

sys.path.insert(0, "/root/repo")
from bench import bench_inference, _log  # noqa: E402
from skyhdr.config import Config, DataConfig, ModelConfig  # noqa: E402


def main():
    for name, cd, wd in (
        ("64x256 DA bf16c f32w", "bfloat16", None),
        ("64x256 DA bf16c bf16w", "bfloat16", "bfloat16"),
        ("64x256 DA f32c bf16w", "float32", "bfloat16"),
    ):
        cfg = Config(model=ModelConfig(im_height=64, im_width=256,
                                       use_da_conv=True, compute_dtype=cd),
                     data=DataConfig(batch_size=32))
        _log(f"{name} ...")
        res = bench_inference(cfg, 32, iters=20, weights_dtype=wd)
        _log(f"  {res['panoramas_per_s']:.1f} pano/s (min {res['ms']:.2f} ms "
             f"over {res['spread_ms']}), mfu {res['mfu']:.3f}")


if __name__ == "__main__":
    main()
