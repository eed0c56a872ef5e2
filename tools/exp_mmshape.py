"""Pure MXU microbench: what does a small dot cost inside a Pallas kernel?

Total contraction work held constant at the DA-conv budget
(b*h_out = 2048 rows-blocks, 9 taps of [256,64]@[64,64] each):
  a18 : 18 dots of [256, 64]@[ 64,64] per step, 1024 steps (2 rows/step)
  b9  :  9 dots of [256,128]@[128,64] per step   (tap-paired)
  c3  :  3 dots of [256,384]@[384,64] per step   (6 taps fused)
  d2  :  2 dots of [256,576]@[576,64] per step   (9 taps fused, padded)
  t18 : 18 dots of [64,64]@[64,256] per step     (transposed form)
Each also in bf16 inputs with the 'h' suffix.
"""

import argparse
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, inputs):
    jax.block_until_ready(fn(inputs[0]))
    t0 = time.perf_counter()
    outs = [fn(x) for x in inputs]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / len(inputs)


def make_bench(m, k, f, ndots, steps, dtype):
    def kernel(x_ref, k_ref, o_ref):
        acc = jnp.zeros((m, f), jnp.float32)
        for i in range(ndots):
            acc += jnp.dot(x_ref[...], k_ref[...],
                           preferred_element_type=jnp.float32)
        o_ref[...] = acc

    def run(x):
        lhs = x[:m, :k].astype(dtype)
        rhs = x[:k, :f].astype(dtype)
        return pl.pallas_call(
            kernel,
            grid=(steps,),
            in_specs=[pl.BlockSpec((m, k), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((k, f), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((m, f), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, f), jnp.float32),
        )(lhs, rhs)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", type=str,
                    default="a18,b9,c3,d2,t18,a18h,b9h,d2h")
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    inputs = [jnp.asarray(rng.normal(size=(600, 600)), jnp.float32)
              for _ in range(12)]
    jax.block_until_ready(inputs)

    # (name, m, k, f, ndots, steps); total MACs constant = 2048*9*256*64*64
    cfgs = {
        "a18": (256, 64, 64, 18, 1024),
        "b9": (256, 128, 64, 9, 1024),
        "c3": (256, 384, 64, 3, 1024),
        "d2": (256, 576, 64, 2, 1024),
        "t18": (64, 64, 256, 18, 1024),
        "tb9": (64, 128, 256, 9, 1024),
    }
    total_macs = 2048 * 9 * 256 * 64 * 64
    for name in args.variants.split(","):
        base = name[:-1] if name.endswith("h") else name
        dtype = jnp.bfloat16 if name.endswith("h") else jnp.float32
        if base not in cfgs:
            continue
        m, k, f, ndots, steps = cfgs[base]
        fn = jax.jit(make_bench(m, k, f, ndots, steps, dtype))
        try:
            t = timeit(fn, inputs)
        except Exception as e:
            print(f"{name:>6}: FAILED {type(e).__name__}: {e}")
            sys.stdout.flush()
            continue
        print(f"{name:>6}: {t*1e3:7.3f} ms  {2*total_macs/t/1e12:6.2f} TF/s "
              f"({m}x{k}@{k}x{f} x{ndots} x{steps})")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
