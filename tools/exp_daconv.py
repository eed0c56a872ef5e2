"""DA-conv Pallas kernel experiments (round 2). Times variants on the real
device against the production kernel and the XLA path.

Usage: python tools/exp_daconv.py [--b 32] [--h 64] [--w 256] [--c 64] [--f 64]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from skyhdr.ops.distortion import deformable_conv2d, gather_tables
from skyhdr.ops.pallas.deform_conv import _pallas_forward as prod_forward


def timeit_inputs(fn, inputs):
    jax.block_until_ready(fn(inputs[0]))
    t0 = time.perf_counter()
    outs = [fn(x) for x in inputs]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / len(inputs)


# --------------------------------------------------------------------------
# Variant A: doubled image in HBM; per-tap sliced reads (no scratch writes);
# rblk rows per grid step, static unroll; optional parallel dim semantics.
# --------------------------------------------------------------------------

def _kernel_a(k2, rblk, w, c, f,
              y0_ref, y1_ref, cx_ref, wy_ref, wx_ref,
              x_ref, k_ref, out_ref):
    i0 = pl.program_id(1) * rblk
    for r in range(rblk):
        i = i0 + r
        acc = jnp.zeros((w, f), jnp.float32)
        for t in range(k2):
            y0 = y0_ref[i, t]
            y1 = y1_ref[i, t]
            cx = cx_ref[i, t]
            wy = wy_ref[i, t]
            wx = wx_ref[i, t]
            s0 = x_ref[0, y0, pl.ds(cx, w + 1), :].astype(jnp.float32)
            s1 = x_ref[0, y1, pl.ds(cx, w + 1), :].astype(jnp.float32)
            sy = (1.0 - wy) * s0 + wy * s1          # [w+1, c]
            sample = (1.0 - wx) * sy[:w] + wx * sy[1:]
            acc += jnp.dot(sample, k_ref[t * c:(t + 1) * c, :],
                           preferred_element_type=jnp.float32)
        out_ref[0, r] = acc.astype(out_ref.dtype)


def forward_a(x, kernel, *, kernel_size=3, dilation_rate=1, skydome=True,
              rblk=2, store=jnp.float32, semantics=None):
    b, h, w, c = x.shape
    k2 = kernel_size * kernel_size
    f = kernel.shape[-1]
    t = gather_tables(h, w, kernel_size, 1, dilation_rate, skydome)
    h_out = t.y0.shape[0]
    xp = jnp.pad(x, ((0, 0), (t.pad, t.pad), (0, 0), (0, 0))).astype(store)
    xd = jnp.concatenate([xp, xp[:, :, :1]], axis=2)  # placeholder; replaced below
    # Full doubling: slice pl.ds(cx, w+1) needs cx + w + 1 <= 2w.
    xd = jnp.concatenate([xp, xp], axis=2)
    h_pad = xp.shape[1]
    assert h_out % rblk == 0, (h_out, rblk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(b, h_out // rblk),
        in_specs=[
            pl.BlockSpec((1, h_pad, 2 * w, c), lambda bb, ii, *r: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2 * c, f), lambda bb, ii, *r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rblk, w, f),
                               lambda bb, ii, *r: (bb, ii, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    kwargs = {}
    if semantics is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=semantics)
    body = functools.partial(_kernel_a, k2, rblk, w, c, f)
    return pl.pallas_call(
        body, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h_out, w, f), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h_out * w * k2 * c * f,
            bytes_accessed=b * h_pad * 2 * w * c * 4 + b * h_out * w * f * 4,
            transcendentals=0),
        **kwargs,
    )(jnp.asarray(t.y0), jnp.asarray(t.y1), jnp.asarray(t.cx0),
      jnp.asarray(t.wy), jnp.asarray(t.wx), xd, kernel.astype(jnp.float32))


# --------------------------------------------------------------------------
# Variant B: like A but samples staged to a [rblk*w, k2*c] scratch and ONE
# matmul per grid step (bigger MXU op).
# --------------------------------------------------------------------------

def _kernel_b(k2, rblk, w, c, f,
              y0_ref, y1_ref, cx_ref, wy_ref, wx_ref,
              x_ref, k_ref, out_ref, smp_ref):
    i0 = pl.program_id(1) * rblk
    for r in range(rblk):
        i = i0 + r
        for t in range(k2):
            y0 = y0_ref[i, t]
            y1 = y1_ref[i, t]
            cx = cx_ref[i, t]
            wy = wy_ref[i, t]
            wx = wx_ref[i, t]
            s0 = x_ref[0, y0, pl.ds(cx, w + 1), :].astype(jnp.float32)
            s1 = x_ref[0, y1, pl.ds(cx, w + 1), :].astype(jnp.float32)
            sy = (1.0 - wy) * s0 + wy * s1
            smp_ref[r * w:(r + 1) * w, t * c:(t + 1) * c] = (
                (1.0 - wx) * sy[:w] + wx * sy[1:])
    out = jnp.dot(smp_ref[...], k_ref[...],
                  preferred_element_type=jnp.float32)
    out_ref[0] = out.reshape(rblk, w, f).astype(out_ref.dtype)


def forward_b(x, kernel, *, kernel_size=3, dilation_rate=1, skydome=True,
              rblk=2, store=jnp.float32, semantics=None):
    b, h, w, c = x.shape
    k2 = kernel_size * kernel_size
    f = kernel.shape[-1]
    t = gather_tables(h, w, kernel_size, 1, dilation_rate, skydome)
    h_out = t.y0.shape[0]
    xp = jnp.pad(x, ((0, 0), (t.pad, t.pad), (0, 0), (0, 0))).astype(store)
    xd = jnp.concatenate([xp, xp], axis=2)
    h_pad = xp.shape[1]
    assert h_out % rblk == 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(b, h_out // rblk),
        in_specs=[
            pl.BlockSpec((1, h_pad, 2 * w, c), lambda bb, ii, *r: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2 * c, f), lambda bb, ii, *r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rblk, w, f),
                               lambda bb, ii, *r: (bb, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((rblk * w, k2 * c), jnp.float32)],
    )
    kwargs = {}
    if semantics is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=semantics)
    body = functools.partial(_kernel_b, k2, rblk, w, c, f)
    return pl.pallas_call(
        body, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h_out, w, f), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h_out * w * k2 * c * f,
            bytes_accessed=b * h_pad * 2 * w * c * 4 + b * h_out * w * f * 4,
            transcendentals=0),
        **kwargs,
    )(jnp.asarray(t.y0), jnp.asarray(t.y1), jnp.asarray(t.cx0),
      jnp.asarray(t.wy), jnp.asarray(t.wx), xd, kernel.astype(jnp.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--h", type=int, default=64)
    ap.add_argument("--w", type=int, default=256)
    ap.add_argument("--c", type=int, default=64)
    ap.add_argument("--f", type=int, default=64)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--variants", type=str, default="prod,a2,a4,a8,b4")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    shape = (args.b, args.h, args.w, args.c)
    inputs = [jnp.asarray(rng.normal(size=shape), jnp.float32)
              for _ in range(args.iters)]
    jax.block_until_ready(inputs)
    k = jnp.asarray(rng.normal(size=(9 * args.c, args.f)) * 0.05, jnp.float32)
    bias = jnp.zeros((args.f,), jnp.float32)
    flops = 2 * args.b * args.h * args.w * 9 * args.c * args.f

    # Correctness reference (small slice check to keep it fast).
    ref = jax.jit(lambda xx: deformable_conv2d(xx, k, bias))(inputs[0])

    def report(name, fn, check=True):
        try:
            out = jax.block_until_ready(jax.jit(fn)(inputs[0]))
        except Exception as e:
            print(f"{name:>14}: FAILED {type(e).__name__}: {e}")
            return
        if check:
            err = float(jnp.max(jnp.abs(out - ref)))
            scale = float(jnp.max(jnp.abs(ref)))
        else:
            err, scale = 0.0, 1.0
        t = timeit_inputs(jax.jit(fn), inputs)
        print(f"{name:>14}: {t*1e3:7.3f} ms  {flops/t/1e12:6.2f} TF/s  "
              f"maxerr {err:.2e} (rel {err/scale:.2e})")

    variants = args.variants.split(",")
    if "xla" in variants:
        report("xla", lambda xx: deformable_conv2d(xx, k, bias))
    if "prod" in variants:
        report("prod", lambda xx: prod_forward(
            xx, k, kernel_size=3, dilation_rate=1, skydome=True) + bias)
    for rblk in (1, 2, 4, 8, 16):
        if f"a{rblk}" in variants:
            report(f"a{rblk}", functools.partial(
                lambda xx, rb: forward_a(xx, k, rblk=rb) + bias, rb=rblk))
        if f"a{rblk}p" in variants:
            report(f"a{rblk}p", functools.partial(
                lambda xx, rb: forward_a(
                    xx, k, rblk=rb,
                    semantics=("parallel", "arbitrary")) + bias, rb=rblk))
        if f"a{rblk}h" in variants:  # bf16 storage
            report(f"a{rblk}h", functools.partial(
                lambda xx, rb: forward_a(xx, k, rblk=rb,
                                         store=jnp.bfloat16) + bias, rb=rblk))
        if f"b{rblk}" in variants:
            report(f"b{rblk}", functools.partial(
                lambda xx, rb: forward_b(xx, k, rblk=rb) + bias, rb=rblk))


if __name__ == "__main__":
    main()
