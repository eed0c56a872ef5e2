"""Micro-benchmark of distortion-aware conv variants on the current device.

Usage: python tools/bench_daconv.py [--b 32] [--h 16] [--w 64] [--c 128] [--f 128]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit_inputs(fn, inputs):
    """Chained distinct-input timing: iteration k+1's input depends on
    iteration k's output. Distinct inputs alone defeat relay-side result
    caching but NOT concurrent dispatch (independent executions once
    measured MFU 3.4 on one chip — impossible); the scalar carry forces
    serial per-chip execution (see bench.py:_time_chained)."""
    import jax.numpy as jnp

    # The carry must CONSUME every output element (full reduction): a
    # first-element carry lets XLA dead-code-eliminate output-side work
    # (measured 2 ms of real unpack relayout vanishing at (32,64,256,64)).
    # The final barrier is a float() HOST READ — jax.block_until_ready
    # returns early on this runtime (see bench.py:_host_sync).
    # The warmup input is EXCLUDED from the timed set: re-timing it with
    # the same (zero) carry would be byte-identical to the warmup execution
    # and relay-cacheable.
    chained = jax.jit(lambda c, x: sum(
        jnp.sum(l) for l in jax.tree_util.tree_leaves(fn(x + c))) * 0)
    carry = chained(jnp.zeros((), inputs[0].dtype), inputs[0])
    float(carry)
    timed = inputs[1:]
    t0 = time.perf_counter()
    for x in timed:
        carry = chained(carry, x)
    float(carry)
    return (time.perf_counter() - t0) / len(timed)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--h", type=int, default=16)
    ap.add_argument("--w", type=int, default=64)
    ap.add_argument("--c", type=int, default=128)
    ap.add_argument("--f", type=int, default=128)
    ap.add_argument("--dtype", type=str, default="float32")
    args = ap.parse_args()

    from skyhdr.ops.distortion import deformable_conv2d
    from skyhdr.ops.pallas.deform_conv import (deformable_conv2d_pallas,
                                               pallas_supported)

    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    inputs = [jnp.asarray(rng.normal(size=(args.b, args.h, args.w, args.c)), dt)
              for _ in range(12)]
    jax.block_until_ready(inputs)
    x = inputs[0]
    k = jnp.asarray(rng.normal(size=(9 * args.c, args.f)) * 0.05, dt)
    bias = jnp.zeros((args.f,), dt)

    f_ref = jax.jit(lambda xx: deformable_conv2d(xx, k, bias))
    t = timeit_inputs(f_ref, inputs)
    flops = 2 * args.b * args.h * args.w * 9 * args.c * args.f
    print(f"deformable_conv2d: {t*1e3:.3f} ms  "
          f"({flops/t/1e12:.2f} TF/s)  shape {x.shape}->{args.f}")

    if pallas_supported(x.shape):
        f_pl = jax.jit(lambda xx: deformable_conv2d_pallas(xx, k, bias))
        tp = timeit_inputs(f_pl, inputs)
        print(f"pallas forward   : {tp*1e3:.3f} ms  "
              f"({flops/tp/1e12:.2f} TF/s)  ({t/tp:.1f}x over XLA)")

        # Grad wrt (x, kernel, bias) — the cotangents a train step needs.
        f_plg = jax.jit(lambda xx: jax.grad(
            lambda xx_, kk, bb: jnp.sum(
                deformable_conv2d_pallas(xx_, kk, bb) ** 2),
            argnums=(0, 1, 2))(xx, k, bias))
        f_xlg = jax.jit(lambda xx: jax.grad(
            lambda xx_, kk, bb: jnp.sum(
                deformable_conv2d(xx_, kk, bb) ** 2),
            argnums=(0, 1, 2))(xx, k, bias))
        tpg = timeit_inputs(f_plg, inputs)
        txg = timeit_inputs(f_xlg, inputs)
        print(f"pallas fwd+bwd   : {tpg*1e3:.3f} ms  (XLA fwd+bwd "
              f"{txg*1e3:.3f} ms, {txg/tpg:.1f}x)")

    # Plain conv of the same FLOPs for comparison.
    kc = jnp.asarray(rng.normal(size=(3, 3, args.c, args.f)) * 0.05, dt)
    f_conv = jax.jit(lambda xx: jax.lax.conv_general_dilated(
        xx, kc, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))
    t2 = timeit_inputs(f_conv, inputs)
    print(f"plain conv2d     : {t2*1e3:.3f} ms  ({flops/t2/1e12:.2f} TF/s)")
    print(f"DA/plain ratio   : {t/t2:.1f}x")


if __name__ == "__main__":
    main()
