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


def timeit_inputs(fn, inputs, repeats=2):
    """Pipelined timing: dispatch ALL iterations, block once, divide.

    Per-iteration blocking (the old form) adds a full relay round-trip
    (~20 ms on a bad day) to EVERY iteration on this tunneled TPU —
    it measures dispatch latency, not device time, and drowned the
    kernel signal completely on 2026-08-17. Min over `repeats`
    independent pipelined passes, distinct inputs per iteration."""
    jax.block_until_ready(fn(inputs[0]))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = [fn(x) for x in inputs]
        jax.block_until_ready(outs)
        ts.append((time.perf_counter() - t0) / len(inputs))
    return min(ts)


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



# --------------------------------------------------------------------------
# Variant C: pltpu.roll dynamic cyclic shift on the UNDOUBLED image — no
# scratch writes, taps fully independent (ILP), f32 storage fits VMEM.
# c{n}  : per-row accumulate, rblk rows unrolled per grid step
# cs{n} : samples staged to [rblk*w, k2*c] scratch, ONE matmul per step
# --------------------------------------------------------------------------

def _kernel_c(k2, rblk, w, c, f,
              y0_ref, y1_ref, sh_ref, wy_ref, wx_ref,
              x_ref, k_ref, out_ref):
    i0 = pl.program_id(1) * rblk
    for r in range(rblk):
        i = i0 + r
        acc = jnp.zeros((w, f), jnp.float32)
        for t in range(k2):
            y0 = y0_ref[i, t]
            y1 = y1_ref[i, t]
            sh = sh_ref[i, t]  # (w - cx) % w, precomputed on host
            wy = wy_ref[i, t]
            wx = wx_ref[i, t]
            row0 = x_ref[0, y0, :, :].astype(jnp.float32)
            row1 = x_ref[0, y1, :, :].astype(jnp.float32)
            rowy = (1.0 - wy) * row0 + wy * row1
            g0 = pltpu.roll(rowy, sh, 0)        # g0[j] = rowy[(j+cx) mod w]
            g1 = pltpu.roll(g0, w - 1, 0)       # static extra shift by -1
            sample = (1.0 - wx) * g0 + wx * g1
            acc += jnp.dot(sample, k_ref[t * c:(t + 1) * c, :],
                           preferred_element_type=jnp.float32)
        out_ref[0, r] = acc.astype(out_ref.dtype)


def _kernel_cs(k2, rblk, w, c, f,
               y0_ref, y1_ref, sh_ref, wy_ref, wx_ref,
               x_ref, k_ref, out_ref, smp_ref):
    i0 = pl.program_id(1) * rblk
    for r in range(rblk):
        i = i0 + r
        for t in range(k2):
            y0 = y0_ref[i, t]
            y1 = y1_ref[i, t]
            sh = sh_ref[i, t]
            wy = wy_ref[i, t]
            wx = wx_ref[i, t]
            row0 = x_ref[0, y0, :, :].astype(jnp.float32)
            row1 = x_ref[0, y1, :, :].astype(jnp.float32)
            rowy = (1.0 - wy) * row0 + wy * row1
            g0 = pltpu.roll(rowy, sh, 0)
            g1 = pltpu.roll(g0, w - 1, 0)
            smp_ref[r * w:(r + 1) * w, t * c:(t + 1) * c] = (
                (1.0 - wx) * g0 + wx * g1)
    out = jnp.dot(smp_ref[...], k_ref[...], preferred_element_type=jnp.float32)
    out_ref[0] = out.reshape(rblk, w, f).astype(out_ref.dtype)


def forward_c(x, kernel, *, kernel_size=3, dilation_rate=1, skydome=True,
              rblk=2, store=jnp.float32, staged=False, semantics=None):
    b, h, w, c = x.shape
    k2 = kernel_size * kernel_size
    f = kernel.shape[-1]
    t = gather_tables(h, w, kernel_size, 1, dilation_rate, skydome)
    h_out = t.y0.shape[0]
    xp = jnp.pad(x, ((0, 0), (t.pad, t.pad), (0, 0), (0, 0))).astype(store)
    h_pad = xp.shape[1]
    assert h_out % rblk == 0
    shifts = ((w - t.cx0.astype(np.int64)) % w).astype(np.int32)

    scratch = ([pltpu.VMEM((rblk * w, k2 * c), jnp.float32)] if staged else [])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(b, h_out // rblk),
        in_specs=[
            pl.BlockSpec((1, h_pad, w, c), lambda bb, ii, *r: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2 * c, f), lambda bb, ii, *r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rblk, w, f),
                               lambda bb, ii, *r: (bb, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    kwargs = {}
    if semantics is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=semantics)
    body = functools.partial(_kernel_cs if staged else _kernel_c,
                             k2, rblk, w, c, f)
    return pl.pallas_call(
        body, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h_out, w, f), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h_out * w * k2 * c * f,
            bytes_accessed=b * h_pad * w * c * 4 + b * h_out * w * f * 4,
            transcendentals=0),
        **kwargs,
    )(jnp.asarray(t.y0), jnp.asarray(t.y1), jnp.asarray(shifts),
      jnp.asarray(t.wy), jnp.asarray(t.wx), xp, kernel.astype(jnp.float32))



# --------------------------------------------------------------------------
# Diagnostic kernels: isolate the cost of each stage at rblk=2.
#   d_noroll : loads + y-interp + matmul, NO column rolls
#   d_nomm   : loads + y-interp + rolls, NO matmul (accumulate on VPU)
#   d_mmonly : single row load + matmul only (no interp, no rolls)
# --------------------------------------------------------------------------

def _kernel_diag(mode, k2, rblk, w, c, f,
                 y0_ref, y1_ref, sh_ref, wy_ref, wx_ref,
                 x_ref, k_ref, out_ref):
    i0 = pl.program_id(1) * rblk
    for r in range(rblk):
        i = i0 + r
        acc = jnp.zeros((w, f), jnp.float32)
        vacc = jnp.zeros((w, c), jnp.float32)
        for t in range(k2):
            y0 = y0_ref[i, t]
            y1 = y1_ref[i, t]
            sh = sh_ref[i, t]
            wy = wy_ref[i, t]
            wx = wx_ref[i, t]
            if mode == "mmonly":
                row0 = x_ref[0, y0, :, :].astype(jnp.float32)
                acc += jnp.dot(row0, k_ref[t * c:(t + 1) * c, :],
                               preferred_element_type=jnp.float32)
                continue
            if mode == "mmhoist":  # ONE load per row; 9 matmuls reuse it
                if t == 0:
                    hoisted = x_ref[0, y0, :, :].astype(jnp.float32)
                acc += jnp.dot(hoisted, k_ref[t * c:(t + 1) * c, :],
                               preferred_element_type=jnp.float32)
                continue
            if mode == "loadonly":  # 2 loads/tap, accumulate cheap
                row0 = x_ref[0, y0, :, :].astype(jnp.float32)
                row1 = x_ref[0, y1, :, :].astype(jnp.float32)
                vacc += row0 + row1
                continue
            if mode == "load1only":  # 1 load/tap
                vacc += x_ref[0, y0, :, :].astype(jnp.float32)
                continue
            if mode == "mmbf16":
                row0 = x_ref[0, y0, :, :]  # stays bf16
                acc += jnp.dot(row0, k_ref[t * c:(t + 1) * c, :].astype(
                    jnp.bfloat16), preferred_element_type=jnp.float32)
                continue
            if mode == "fullbf16":
                row0 = x_ref[0, y0, :, :]
                row1 = x_ref[0, y1, :, :]
                rowy = ((1.0 - wy) * row0.astype(jnp.float32)
                        + wy * row1.astype(jnp.float32))
                g0 = pltpu.roll(rowy, sh, 0)
                g1 = pltpu.roll(g0, w - 1, 0)
                sample = ((1.0 - wx) * g0 + wx * g1).astype(jnp.bfloat16)
                acc += jnp.dot(sample, k_ref[t * c:(t + 1) * c, :].astype(
                    jnp.bfloat16), preferred_element_type=jnp.float32)
                continue
            row0 = x_ref[0, y0, :, :].astype(jnp.float32)
            row1 = x_ref[0, y1, :, :].astype(jnp.float32)
            rowy = (1.0 - wy) * row0 + wy * row1
            if mode == "noroll":
                sample = rowy
            else:
                g0 = pltpu.roll(rowy, sh, 0)
                g1 = pltpu.roll(g0, w - 1, 0)
                sample = (1.0 - wx) * g0 + wx * g1
            if mode == "nomm":
                vacc += sample
            else:
                acc += jnp.dot(sample, k_ref[t * c:(t + 1) * c, :],
                               preferred_element_type=jnp.float32)
        if mode in ("nomm", "loadonly", "load1only"):
            out_ref[0, r] = vacc[:, :f].astype(out_ref.dtype)
        else:
            out_ref[0, r] = acc.astype(out_ref.dtype)



def _kernel_prodbf16(k2, rblk, w, c, f,
                     y0_ref, y1_ref, cx_ref, wy_ref, wx_ref,
                     x_ref, k_ref, out_ref, dbl_ref):
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
            row0 = x_ref[0, y0, :, :].astype(jnp.float32)
            row1 = x_ref[0, y1, :, :].astype(jnp.float32)
            rowy = (1.0 - wy) * row0 + wy * row1
            dbl_ref[0:w, :] = rowy
            dbl_ref[w:2 * w, :] = rowy
            g0 = dbl_ref[pl.ds(cx, w), :]
            g1 = dbl_ref[pl.ds(cx + 1, w), :]
            sample = ((1.0 - wx) * g0 + wx * g1).astype(jnp.bfloat16)
            acc += jnp.dot(sample,
                           k_ref[t * c:(t + 1) * c, :].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        out_ref[0, r] = acc.astype(out_ref.dtype)


def forward_prodbf16(x, kernel, *, rblk=2, store=jnp.bfloat16):
    b, h, w, c = x.shape
    k2, f = 9, kernel.shape[-1]
    t = gather_tables(h, w, 3, 1, 1, True)
    h_out = t.y0.shape[0]
    xp = jnp.pad(x, ((0, 0), (t.pad, t.pad), (0, 0), (0, 0))).astype(store)
    h_pad = xp.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(b, h_out // rblk),
        in_specs=[
            pl.BlockSpec((1, h_pad, w, c), lambda bb, ii, *r: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2 * c, f), lambda bb, ii, *r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rblk, w, f),
                               lambda bb, ii, *r: (bb, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2 * w, c), jnp.float32)],
    )
    body = functools.partial(_kernel_prodbf16, k2, rblk, w, c, f)
    return pl.pallas_call(
        body, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h_out, w, f), jnp.float32),
    )(jnp.asarray(t.y0), jnp.asarray(t.y1), jnp.asarray(t.cx0),
      jnp.asarray(t.wy), jnp.asarray(t.wx), xp, kernel.astype(jnp.float32))


def forward_diag(x, kernel, mode, *, rblk=2, store=jnp.bfloat16):
    b, h, w, c = x.shape
    k2, f = 9, kernel.shape[-1]
    t = gather_tables(h, w, 3, 1, 1, True)
    h_out = t.y0.shape[0]
    xp = jnp.pad(x, ((0, 0), (t.pad, t.pad), (0, 0), (0, 0))).astype(store)
    h_pad = xp.shape[1]
    shifts = ((w - t.cx0.astype(np.int64)) % w).astype(np.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(b, h_out // rblk),
        in_specs=[
            pl.BlockSpec((1, h_pad, w, c), lambda bb, ii, *r: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2 * c, f), lambda bb, ii, *r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rblk, w, f),
                               lambda bb, ii, *r: (bb, ii, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    body = functools.partial(_kernel_diag, mode, k2, rblk, w, c, f)
    return pl.pallas_call(
        body, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h_out, w, f), jnp.float32),
    )(jnp.asarray(t.y0), jnp.asarray(t.y1), jnp.asarray(shifts),
      jnp.asarray(t.wy), jnp.asarray(t.wx), xp, kernel.astype(jnp.float32))



# --------------------------------------------------------------------------
# Tap-pairing: halve MXU M-streaming by contracting TWO taps per matmul —
# lhs [w, 2c] (lane-concat of two gathered samples), rhs [2c, f] (stacked
# K_t; K_t'). The matmul count per row drops 9 -> 5 (last tap pairs with a
# zero block).  pairc: jnp.concatenate value op.  pairs: shared scratch.
# --------------------------------------------------------------------------

def _kernel_pair(k2, rblk, w, c, f, use_scratch,
                 y0_ref, y1_ref, sh_ref, wy_ref, wx_ref,
                 x_ref, k_ref, out_ref, *maybe_scratch):
    smp2 = maybe_scratch[0] if use_scratch else None
    i0 = pl.program_id(1) * rblk
    npair = (k2 + 1) // 2
    for r in range(rblk):
        i = i0 + r
        acc = jnp.zeros((w, f), jnp.float32)

        def gather(t):
            y0 = y0_ref[i, t]
            y1 = y1_ref[i, t]
            sh = sh_ref[i, t]
            wy = wy_ref[i, t]
            wx = wx_ref[i, t]
            row0 = x_ref[0, y0, :, :].astype(jnp.float32)
            row1 = x_ref[0, y1, :, :].astype(jnp.float32)
            rowy = (1.0 - wy) * row0 + wy * row1
            g0 = pltpu.roll(rowy, sh, 0)
            g1 = pltpu.roll(g0, w - 1, 0)
            return (1.0 - wx) * g0 + wx * g1

        for p in range(npair):
            t0, t1 = 2 * p, 2 * p + 1
            s0 = gather(t0)
            if t1 < k2:
                s1 = gather(t1)
                if use_scratch:
                    smp2[:, :c] = s0
                    smp2[:, c:] = s1
                    lhs = smp2[...]
                else:
                    lhs = jnp.concatenate([s0, s1], axis=1)
                acc += jnp.dot(lhs, k_ref[pl.ds(t0 * c, 2 * c), :],
                               preferred_element_type=jnp.float32)
            else:
                acc += jnp.dot(s0, k_ref[pl.ds(t0 * c, c), :],
                               preferred_element_type=jnp.float32)
        out_ref[0, r] = acc.astype(out_ref.dtype)


def forward_pair(x, kernel, *, rblk=2, store=jnp.bfloat16, use_scratch=False):
    b, h, w, c = x.shape
    k2, f = 9, kernel.shape[-1]
    t = gather_tables(h, w, 3, 1, 1, True)
    h_out = t.y0.shape[0]
    xp = jnp.pad(x, ((0, 0), (t.pad, t.pad), (0, 0), (0, 0))).astype(store)
    h_pad = xp.shape[1]
    shifts = ((w - t.cx0.astype(np.int64)) % w).astype(np.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(b, h_out // rblk),
        in_specs=[
            pl.BlockSpec((1, h_pad, w, c), lambda bb, ii, *r: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2 * c, f), lambda bb, ii, *r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rblk, w, f),
                               lambda bb, ii, *r: (bb, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=([pltpu.VMEM((w, 2 * c), jnp.float32)]
                        if use_scratch else []),
    )
    body = functools.partial(_kernel_pair, k2, rblk, w, c, f, use_scratch)
    return pl.pallas_call(
        body, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h_out, w, f), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h_out * w * k2 * c * f,
            bytes_accessed=b * h_pad * w * c * 4 + b * h_out * w * f * 4,
            transcendentals=0),
    )(jnp.asarray(t.y0), jnp.asarray(t.y1), jnp.asarray(shifts),
      jnp.asarray(t.wy), jnp.asarray(t.wx), xp, kernel.astype(jnp.float32))


# --------------------------------------------------------------------------
# Sample-packing: pack P samples' channels onto the 128-lane dimension
# (PC <= 128) with BLOCK-DIAGONAL weights [k2*PC, PF]. Every matmul becomes
# [w, PC] @ [PC, PF] — K and N both grow P-fold, so the number of MXU
# M-streams drops P-fold at unchanged stream length. The pack/unpack is an
# XLA transpose in HBM (once per call), NOT a per-tap VMEM relayout — this
# dodges the lane-offset RMW hazard that serialized the staged-K variants.
# Kernel body is the production dbl-scratch body, just wider rows.
# --------------------------------------------------------------------------

def _pack_samples(x, p):
    b, h, w, c = x.shape
    return (x.reshape(b // p, p, h, w, c)
             .transpose(0, 2, 3, 1, 4)
             .reshape(b // p, h, w, p * c))


def _unpack_samples(y, p):
    bp, h, w, pf = y.shape
    f = pf // p
    return (y.reshape(bp, h, w, p, f)
             .transpose(0, 3, 1, 2, 4)
             .reshape(bp * p, h, w, f))


def _blockdiag_kernel(kernel, k2, c, f, p):
    kb = jnp.zeros((k2, p * c, p * f), kernel.dtype)
    kt = kernel.reshape(k2, c, f)
    for i in range(p):
        kb = kb.at[:, i * c:(i + 1) * c, i * f:(i + 1) * f].set(kt)
    return kb.reshape(k2 * p * c, p * f)


def forward_pack(x, kernel, *, p=2, rblk=2, store=jnp.bfloat16,
                 prepacked=False, roll=False):
    b, h, w, c = x.shape if not prepacked else (
        x.shape[0] * p, x.shape[1], x.shape[2], x.shape[3] // p)
    k2, f = 9, kernel.shape[-1]
    assert b % p == 0 and p * c <= 128
    t = gather_tables(h, w, 3, 1, 1, True)
    h_out = t.y0.shape[0]
    xk = x if prepacked else _pack_samples(x, p)
    xp = jnp.pad(xk, ((0, 0), (t.pad, t.pad), (0, 0), (0, 0))).astype(store)
    h_pad = xp.shape[1]
    pc, pf = p * c, p * f
    kb = _blockdiag_kernel(kernel.astype(jnp.float32), k2, c, f, p)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(b // p, h_out // rblk),
        in_specs=[
            pl.BlockSpec((1, h_pad, w, pc), lambda bb, ii, *r: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2 * pc, pf), lambda bb, ii, *r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rblk, w, pf),
                               lambda bb, ii, *r: (bb, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=([] if roll else
                        [pltpu.VMEM((2 * w, pc), jnp.float32)]),
    )
    if roll is True or isinstance(roll, str):
        shifts = ((w - t.cx0.astype(np.int64)) % w).astype(np.int32)
        if isinstance(roll, str):  # diagnostic mode on the packed shapes
            body = functools.partial(_kernel_diag, roll, k2, rblk, w, pc, pf)
        else:
            body = functools.partial(_kernel_c, k2, rblk, w, pc, pf)
        cols = shifts
    else:
        body = functools.partial(_kernel_prodbf16, k2, rblk, w, pc, pf)
        cols = t.cx0
    out = pl.pallas_call(
        body, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b // p, h_out, w, pf), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h_out * w * k2 * c * f,
            bytes_accessed=b * h_pad * w * c * 4 + b * h_out * w * f * 4,
            transcendentals=0),
    )(jnp.asarray(t.y0), jnp.asarray(t.y1), jnp.asarray(cols),
      jnp.asarray(t.wy), jnp.asarray(t.wx), xp, kb)
    return out if prepacked else _unpack_samples(out, p)


# --------------------------------------------------------------------------
# Row-dedup + interp-reorder (k=3): the y tables depend only on ky, so ONE
# y-interp serves 3 taps (6 loads/row instead of 18); the x-interp commutes
# with the cyclic shift, so h = (1-wx)*rowy + wx*roll(rowy,-1) (static roll,
# once per ky) followed by ONE dynamic roll per tap replaces two dynamic
# rolls per tap. Combine with sample-packing for the full MXU win.
# --------------------------------------------------------------------------

def _kernel_dedup(rblk, mblk, w, c, f,
                  y0_ref, y1_ref, wy_ref, sh_ref, wx_ref,
                  x_ref, k_ref, out_ref):
    """rblk rows per grid step, in groups of mblk rows whose tap samples are
    sublane-concatenated into ONE [mblk*w, c] matmul per tap (aligned
    sublane concat — no lane-offset RMW)."""
    i0 = pl.program_id(1) * rblk
    for g in range(rblk // mblk):
        ig = i0 + g * mblk
        acc = jnp.zeros((mblk * w, f), jnp.float32)
        for ky in range(3):
            rowys, rowns = [], []
            for r in range(mblk):
                y0 = y0_ref[ig + r, ky]
                y1 = y1_ref[ig + r, ky]
                wy = wy_ref[ig + r, ky]
                row0 = x_ref[0, y0, :, :].astype(jnp.float32)
                row1 = x_ref[0, y1, :, :].astype(jnp.float32)
                rowy = (1.0 - wy) * row0 + wy * row1
                rowys.append(rowy)
                rowns.append(pltpu.roll(rowy, w - 1, 0))  # rowy[j+1]
            for kx in range(3):
                t = 3 * ky + kx
                ss = []
                for r in range(mblk):
                    sh = sh_ref[ig + r, t]
                    wx = wx_ref[ig + r, t]
                    h = (1.0 - wx) * rowys[r] + wx * rowns[r]
                    ss.append(pltpu.roll(h, sh, 0))   # h[(j+cx)%w]
                smp = ss[0] if mblk == 1 else jnp.concatenate(ss, axis=0)
                acc += jnp.dot(smp, k_ref[t * c:(t + 1) * c, :],
                               preferred_element_type=jnp.float32)
        out_ref[0, pl.ds(g * mblk, mblk)] = (
            acc.reshape(mblk, w, f).astype(out_ref.dtype))


def forward_dedup(x, kernel, *, p=1, rblk=2, mblk=1, store=jnp.bfloat16,
                  prepacked=False):
    b, h, w, c = x.shape if not prepacked else (
        x.shape[0] * p, x.shape[1], x.shape[2], x.shape[3] // p)
    k2, f = 9, kernel.shape[-1]
    assert b % p == 0 and p * c <= 128
    t = gather_tables(h, w, 3, 1, 1, True)
    h_out = t.y0.shape[0]
    xk = x if (prepacked or p == 1) else _pack_samples(x, p)
    xp = jnp.pad(xk, ((0, 0), (t.pad, t.pad), (0, 0), (0, 0))).astype(store)
    h_pad = xp.shape[1]
    pc, pf = p * c, p * f
    kb = (kernel.astype(jnp.float32) if p == 1 else
          _blockdiag_kernel(kernel.astype(jnp.float32), k2, c, f, p))
    # ky-major tables: y0/y1/wy collapse to [h_out, 3].
    y0 = np.ascontiguousarray(t.y0.reshape(h_out, 3, 3)[:, :, 0])
    y1 = np.ascontiguousarray(t.y1.reshape(h_out, 3, 3)[:, :, 0])
    wy = np.ascontiguousarray(t.wy.reshape(h_out, 3, 3)[:, :, 0])
    shifts = ((w - t.cx0.astype(np.int64)) % w).astype(np.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(b // p, h_out // rblk),
        in_specs=[
            pl.BlockSpec((1, h_pad, w, pc), lambda bb, ii, *r: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2 * pc, pf), lambda bb, ii, *r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rblk, w, pf),
                               lambda bb, ii, *r: (bb, ii, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    assert rblk % mblk == 0
    body = functools.partial(_kernel_dedup, rblk, mblk, w, pc, pf)
    out = pl.pallas_call(
        body, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b // p, h_out, w, pf), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h_out * w * k2 * c * f,
            bytes_accessed=b * h_pad * w * c * 4 + b * h_out * w * f * 4,
            transcendentals=0),
    )(jnp.asarray(y0), jnp.asarray(y1), jnp.asarray(wy),
      jnp.asarray(shifts), jnp.asarray(t.wx), xp, kb)
    return out if (prepacked or p == 1) else _unpack_samples(out, p)


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
    k = jnp.asarray(rng.normal(size=(9 * args.c, args.f)) * 0.05, jnp.float32)
    inputs = [jnp.asarray(rng.normal(size=shape), jnp.float32)
              for _ in range(args.iters)]
    jax.block_until_ready(inputs)
    bias = jnp.zeros((args.f,), jnp.float32)
    flops = 2 * args.b * args.h * args.w * 9 * args.c * args.f

    # Correctness reference, cached on disk (the XLA gather graph takes
    # minutes to compile over the tunnel; the reference output is static).
    cache = f"/tmp/daconv_ref2_{args.b}_{args.h}_{args.w}_{args.c}_{args.f}.npy"
    if os.path.exists(cache):
        ref = jnp.asarray(np.load(cache))
    else:
        ref = jax.jit(lambda xx: deformable_conv2d(xx, k, bias))(inputs[0])
        np.save(cache, np.asarray(ref))

    def report(name, fn, check=True):
        jf = jax.jit(fn)
        try:
            out = jax.block_until_ready(jf(inputs[0]))
        except Exception as e:
            print(f"{name:>14}: FAILED {type(e).__name__}: {e}")
            return
        if check:
            err = float(jnp.max(jnp.abs(out - ref)))
            scale = float(jnp.max(jnp.abs(ref)))
        else:
            err, scale = 0.0, 1.0
        t = timeit_inputs(jf, inputs)
        print(f"{name:>14}: {t*1e3:7.3f} ms  {flops/t/1e12:6.2f} TF/s  "
              f"maxerr {err:.2e} (rel {err/scale:.2e})")

    variants = args.variants.split(",")
    for p in (1, 2, 4):
        if f"dd{p}" in variants:
            report(f"dd{p}", functools.partial(
                lambda xx, pp: forward_dedup(xx, k, p=pp) + bias, pp=p))
        for mb in (2, 4, 8):
            if f"dd{p}m{mb}" in variants:
                report(f"dd{p}m{mb}", functools.partial(
                    lambda xx, pp, mm: forward_dedup(
                        xx, k, p=pp, rblk=mm, mblk=mm) + bias, pp=p, mm=mb))
        if f"dd{p}k" in variants and p > 1:
            packed = [jax.block_until_ready(jax.jit(
                functools.partial(_pack_samples, p=p))(x)) for x in inputs]
            jf = jax.jit(functools.partial(
                forward_dedup, kernel=k, p=p, prepacked=True))
            jax.block_until_ready(jf(packed[0]))
            tsec = timeit_inputs(jf, packed)
            print(f"{f'dd{p}k':>14}: {tsec*1e3:7.3f} ms  "
                  f"{flops/tsec/1e12:6.2f} TF/s  (kernel only, no repack)")
    for p in (2, 4):
        if f"pack{p}" in variants:
            report(f"pack{p}", functools.partial(
                lambda xx, pp: forward_pack(xx, k, p=pp) + bias, pp=p))
        if f"pack{p}r" in variants:
            report(f"pack{p}r", functools.partial(
                lambda xx, pp: forward_pack(xx, k, p=pp, roll=True) + bias,
                pp=p))
        for mode in ("mmonly", "mmhoist", "loadonly", "load1only",
                     "nomm", "noroll", "fullbf16"):
            for sfx, sdt in (("", jnp.bfloat16), ("f", jnp.float32)):
                if f"pack{p}:{mode}{sfx}" not in variants:
                    continue
                packed = [jax.block_until_ready(jax.jit(
                    functools.partial(_pack_samples, p=p))(x))
                    for x in inputs]
                jf = jax.jit(functools.partial(
                    forward_pack, kernel=k, p=p, prepacked=True, roll=mode,
                    store=sdt))
                jax.block_until_ready(jf(packed[0]))
                tsec = timeit_inputs(jf, packed)
                print(f"{f'pack{p}:{mode}{sfx}':>14}: {tsec*1e3:7.3f} ms  "
                      f"{flops/tsec/1e12:6.2f} TF/s  (diag, kernel only)")
        if f"pack{p}k" in variants:  # kernel only: pre-packed in, packed out
            packed = [jax.block_until_ready(jax.jit(
                functools.partial(_pack_samples, p=p))(x)) for x in inputs]
            jf = jax.jit(functools.partial(
                forward_pack, kernel=k, p=p, prepacked=True))
            jax.block_until_ready(jf(packed[0]))
            tsec = timeit_inputs(jf, packed)
            print(f"{f'pack{p}k':>14}: {tsec*1e3:7.3f} ms  "
                  f"{flops/tsec/1e12:6.2f} TF/s  (kernel only, no repack)")
    if "pairc" in variants:
        report("pairc", lambda xx: forward_pair(xx, k) + bias)
    if "pairs" in variants:
        report("pairs", lambda xx: forward_pair(xx, k, use_scratch=True) + bias)
    if "prodbf16" in variants:
        report("prodbf16", lambda xx: forward_prodbf16(xx, k) + bias)
    for mode in ("noroll", "nomm", "mmonly", "mmbf16", "fullbf16",
                 "loadonly", "load1only", "mmhoist"):
        if mode in variants:
            report(mode, functools.partial(
                lambda xx, m: forward_diag(xx, k, m) + bias, m=mode),
                check=(mode == "fullbf16"))
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
        if f"c{rblk}" in variants:
            report(f"c{rblk}", functools.partial(
                lambda xx, rb: forward_c(xx, k, rblk=rb) + bias, rb=rblk))
        if f"c{rblk}p" in variants:
            report(f"c{rblk}p", functools.partial(
                lambda xx, rb: forward_c(
                    xx, k, rblk=rb,
                    semantics=("parallel", "arbitrary")) + bias, rb=rblk))
        if f"c{rblk}h" in variants:
            report(f"c{rblk}h", functools.partial(
                lambda xx, rb: forward_c(xx, k, rblk=rb,
                                         store=jnp.bfloat16) + bias, rb=rblk))
        if f"cs{rblk}h" in variants:
            report(f"cs{rblk}h", functools.partial(
                lambda xx, rb: forward_c(xx, k, rblk=rb, staged=True,
                                         store=jnp.bfloat16) + bias, rb=rblk))
        if f"cs{rblk}" in variants:
            report(f"cs{rblk}", functools.partial(
                lambda xx, rb: forward_c(xx, k, rblk=rb, staged=True) + bias,
                rb=rblk))
        if f"b{rblk}" in variants:
            report(f"b{rblk}", functools.partial(
                lambda xx, rb: forward_b(xx, k, rblk=rb,
                                         store=jnp.bfloat16) + bias, rb=rblk))


if __name__ == "__main__":
    main()
