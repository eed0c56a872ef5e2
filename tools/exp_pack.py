"""Sample-packing formulations A/B: how to get [B,H,W,C] -> [B/P,H,W,P*C]
into a Pallas operand without XLA's slow minor-dim transpose relayout.

Isolated jit(_pack_samples) times ~0.04 ms because layout assignment makes
the transpose a free layout change on the OUTPUT; feeding the same op into
a pallas_call forces a real relayout copy (~2.4 ms at (32,64,256,64),
measured 2026-08-17). Variants here are timed feeding the REAL production
kernel so the consumer constraint is live.
"""

import functools
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit_inputs(fn, inputs, repeats=2):
    jax.block_until_ready(fn(inputs[0]))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = [fn(x) for x in inputs]
        jax.block_until_ready(outs)
        ts.append((time.perf_counter() - t0) / len(inputs))
    return min(ts)


def pack_transpose(x, p):
    b, h, w, c = x.shape
    return (x.reshape(b // p, p, h, w, c)
             .transpose(0, 2, 3, 1, 4)
             .reshape(b // p, h, w, p * c))


def pack_concat(x, p):
    return jnp.concatenate([x[s::p] for s in range(p)], axis=-1)


def _pack_kernel(p, c, x_ref, o_ref):
    for s in range(p):
        o_ref[0, :, :, s * c:(s + 1) * c] = x_ref[s]


def pack_pallas(x, p):
    """Explicit copy kernel: p consecutive samples' channel blocks land in
    disjoint lane ranges of one output row block; grid row-blocked to
    bound VMEM."""
    b, h, w, c = x.shape
    hblk = 1
    while hblk * 2 <= 8 and h % (hblk * 2) == 0:
        hblk *= 2
    return pl.pallas_call(
        functools.partial(_pack_kernel, p, c),
        grid=(b // p, h // hblk),
        in_specs=[pl.BlockSpec((p, hblk, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, hblk, w, p * c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b // p, h, w, p * c), x.dtype),
    )(x)


def main():
    from skyhdr.ops.pallas import deform_conv as dc

    b, h, w, c, f, p = 32, 64, 256, 64, 64, 2
    rng = np.random.default_rng(0)
    inputs = [jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
              for _ in range(12)]
    jax.block_until_ready(inputs)
    k = jnp.asarray(rng.normal(size=(9 * c, f)) * 0.05, jnp.float32)
    bias = jnp.zeros((f,), jnp.float32)

    ref = None
    for name, packer in [("transpose", pack_transpose),
                         ("concat", pack_concat),
                         ("pallas", pack_pallas)]:
        orig = dc._pack_samples
        dc._pack_samples = packer
        try:
            fn = jax.jit(lambda xx: dc.deformable_conv2d_pallas(xx, k, bias))
            out = jax.block_until_ready(fn(inputs[0]))
            if ref is None:
                ref = out
            err = float(jnp.max(jnp.abs(out - ref)))
            t = timeit_inputs(fn, inputs)
            print(f"pack={name:>10}: {t*1e3:7.3f} ms  maxerr {err:.2e}")
        finally:
            dc._pack_samples = orig


if __name__ == "__main__":
    main()
