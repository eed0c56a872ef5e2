"""Fused Pallas kernel for the distortion-aware equirectangular conv.

What the XLA path (skyhdr.ops.distortion.deformable_conv2d) still pays for:
each of the k^2 taps materializes a [B, H, W, C] gathered temporary in HBM
before its matmul. This kernel keeps one sample's padded image resident in
VMEM and, per output row, does the whole tap pipeline on-chip:

  for tap t:                                  (static unroll, k^2 = 9)
    rowY = (1-wy)*img[y0[i,t]] + wy*img[y1[i,t]]   # two VMEM row reads
    dbl  = concat(rowY, rowY)                      # cyclic shift source
    g0   = dbl[cx[i,t]  : cx[i,t]+W]               # dynamic slice = roll
    g1   = dbl[cx[i,t]+1: cx[i,t]+1+W]
    acc += ((1-wx)*g0 + wx*g1) @ K[t]              # MXU

Index tables (per-row y0/y1/cx/wy/wx from skyhdr.ops.distortion.
gather_tables) arrive via scalar prefetch so row addressing is resolved
before the body runs. Grid is (B, H_out) with the image block's index map
constant in the row dimension — the HBM->VMEM fetch happens once per sample.

Training runs Pallas in BOTH directions: the custom VJP computes dK by
rematerializing the forward gather (contracted against the cotangent) and
dx by inverting the row scatter offline into static per-input-row reference
lists (scatter_tables) — no XLA scatter-adds anywhere. Shapes outside the
VMEM budgets fall back to XLA's autodiff of the equivalent gather graph.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from skyhdr.ops.distortion import (deformable_conv2d, gather_tables,
                                   scatter_tables)

# VMEM budgets for the resident image block (bytes). The pipeline
# double-buffers the block, so the effective footprint is ~2x; above the
# f32 budget the block is stored bf16 (compute stays f32), above the bf16
# budget we fall back to the XLA path.
_VMEM_F32_BUDGET = 3 * 1024 * 1024
_VMEM_BF16_BUDGET = 6 * 1024 * 1024


def _store_dtype(x_shape, kernel_size: int):
    b, h, w, c = x_shape
    pad = (kernel_size - 1) // 2
    f32_bytes = (h + 2 * pad) * w * c * 4
    if f32_bytes <= _VMEM_F32_BUDGET:
        return jnp.float32
    if f32_bytes // 2 <= _VMEM_BF16_BUDGET:
        return jnp.bfloat16
    return None


def pallas_supported(x_shape, kernel_size: int = 3, stride: int = 1) -> bool:
    return (stride == 1 and x_shape[2] >= 8
            and _store_dtype(x_shape, kernel_size) is not None)


def _kernel_body(k2: int, rblk: int, w: int, c: int, f: int,
                 y0_ref, y1_ref, cx_ref, wy_ref, wx_ref,
                 x_ref, k_ref, out_ref, dbl_ref):
    i0 = pl.program_id(1) * rblk

    for r in range(rblk):  # static unroll; rblk kept tiny to bound VMEM
        i = i0 + r
        acc = jnp.zeros((w, f), jnp.float32)
        for t in range(k2):
            y0 = y0_ref[i, t]
            y1 = y1_ref[i, t]
            cx = cx_ref[i, t]
            wy = wy_ref[i, t]
            wx = wx_ref[i, t]

            row0 = x_ref[0, y0, :, :].astype(jnp.float32)  # [w, c]
            row1 = x_ref[0, y1, :, :].astype(jnp.float32)
            rowy = (1.0 - wy) * row0 + wy * row1
            # Doubled row in VMEM scratch: a dynamic-slice read of it IS
            # the cyclic column shift.
            dbl_ref[0:w, :] = rowy
            dbl_ref[w:2 * w, :] = rowy
            g0 = dbl_ref[pl.ds(cx, w), :]
            g1 = dbl_ref[pl.ds(cx + 1, w), :]
            sample = (1.0 - wx) * g0 + wx * g1
            acc += jnp.dot(sample, k_ref[t * c:(t + 1) * c, :],
                           preferred_element_type=jnp.float32)

        out_ref[0, r] = acc.astype(out_ref.dtype)


def _pallas_forward(x, kernel, *, kernel_size: int, dilation_rate: int,
                    skydome: bool):
    b, h, w, c = x.shape
    k2 = kernel_size * kernel_size
    f = kernel.shape[-1]
    t = gather_tables(h, w, kernel_size, 1, dilation_rate, skydome)
    h_out = t.y0.shape[0]
    store = _store_dtype(x.shape, kernel_size) or jnp.float32
    xp = jnp.pad(x, ((0, 0), (t.pad, t.pad), (0, 0), (0, 0))).astype(store)
    h_pad = xp.shape[1]

    rblk = 2 if h_out % 2 == 0 else 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(b, h_out // rblk),
        in_specs=[
            pl.BlockSpec((1, h_pad, w, c), lambda bb, ii, *refs: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2 * c, f), lambda bb, ii, *refs: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rblk, w, f),
                               lambda bb, ii, *refs: (bb, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2 * w, c), jnp.float32)],
    )

    body = functools.partial(_kernel_body, k2, rblk, w, c, f)
    out = pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h_out, w, f), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h_out * w * k2 * c * f,
            bytes_accessed=b * h_pad * w * c * 4 + b * h_out * w * f * 4,
            transcendentals=0,
        ),
    )(
        jnp.asarray(t.y0), jnp.asarray(t.y1), jnp.asarray(t.cx0),
        jnp.asarray(t.wy), jnp.asarray(t.wx),
        xp, kernel.astype(jnp.float32),
    )
    return out


# ---------------------------------------------------------------------------
# Backward kernels. The XLA autodiff of the gather path lowers the adjoint to
# scatter-adds (slow, serialized on TPU); instead both cotangents are
# computed as gathers with STATIC index tables:
#   dK[t]  = sum_{b,i} sample(i,t)^T @ g[b,i]    — the forward gather again,
#            contracted against the output cotangent (rematerialization);
#   dx[y]  = sum_{refs(y)} wgt * roll-adjoint(g[i]) @ K[t]^T — the row
#            scatter inverted OFFLINE into per-input-row reference lists
#            (skyhdr.ops.distortion.scatter_tables; <=21 refs/row at k=3),
#            turning the scatter-add into a dense per-row accumulation.
# Cyclic column shifts use pltpu.roll (dynamic sublane slicing of multi-dim
# blocks is not supported by Mosaic), keeping every tap's chain independent.
# ---------------------------------------------------------------------------


def _dk_kernel(k2, rblk, w, c, f,
               y0_ref, y1_ref, sh_ref, wy_ref, wx_ref,
               x_ref, g_ref, out_ref):
    i0 = pl.program_id(1) * rblk
    accs = [jnp.zeros((c, f), jnp.float32) for _ in range(k2)]
    for r in range(rblk):
        i = i0 + r
        g_row = g_ref[0, r].astype(jnp.float32)  # [w, f]
        for t in range(k2):
            y0 = y0_ref[i, t]
            y1 = y1_ref[i, t]
            sh = sh_ref[i, t]  # (w - cx0) % w, host-precomputed
            wy = wy_ref[i, t]
            wx = wx_ref[i, t]
            row0 = x_ref[0, y0, :, :].astype(jnp.float32)
            row1 = x_ref[0, y1, :, :].astype(jnp.float32)
            rowy = (1.0 - wy) * row0 + wy * row1
            g0 = pltpu.roll(rowy, sh, 0)       # g0[j] = rowy[(j+cx) mod w]
            g1 = pltpu.roll(g0, w - 1, 0)      # one further static -1 shift
            sample = (1.0 - wx) * g0 + wx * g1
            accs[t] += jax.lax.dot_general(
                sample, g_row, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    dk = jnp.concatenate(accs, axis=0)  # [k2*c, f]

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        out_ref[...] = dk

    @pl.when((pl.program_id(0) > 0) | (pl.program_id(1) > 0))
    def _acc():
        out_ref[...] += dk


def _dx_kernel(nrefs, rblk, w, c, f,
               ri_ref, rt_ref, rw_ref, rcx_ref, rwx_ref,
               g_ref, kt_ref, out_ref):
    y0 = pl.program_id(1) * rblk
    for r in range(rblk):
        y = y0 + r
        acc = jnp.zeros((w, c), jnp.float32)
        for j in range(nrefs):
            i = ri_ref[y, j]
            t = rt_ref[y, j]
            wgt = rw_ref[y, j]     # 0 for table padding (harmless extra ops)
            cx = rcx_ref[y, j]
            wx = rwx_ref[y, j]
            g_row = g_ref[0, i].astype(jnp.float32)      # [w, f]
            r0 = pltpu.roll(g_row, cx, 0)                # roll by +cx
            r1 = pltpu.roll(r0, 1, 0)                    # +1 more (static)
            u = wgt * ((1.0 - wx) * r0 + wx * r1)
            start = t * f
            if f % 8 == 0:  # help Mosaic prove sublane alignment
                start = pl.multiple_of(start, 8)
            acc += jnp.dot(u, kt_ref[pl.ds(start, f), :],
                           preferred_element_type=jnp.float32)
        out_ref[0, r] = acc.astype(out_ref.dtype)


def _row_block(n: int, target: int = 8) -> int:
    blk = 1
    for cand in (2, 4, 8):
        if cand <= target and n % cand == 0:
            blk = cand
    return blk


def _pallas_dk(x, g, *, kernel_size: int, dilation_rate: int, skydome: bool,
               f: int):
    b, h, w, c = x.shape
    k2 = kernel_size * kernel_size
    t = gather_tables(h, w, kernel_size, 1, dilation_rate, skydome)
    h_out = t.y0.shape[0]
    store = _store_dtype(x.shape, kernel_size) or jnp.float32
    xp = jnp.pad(x, ((0, 0), (t.pad, t.pad), (0, 0), (0, 0))).astype(store)
    h_pad = xp.shape[1]
    rblk = _row_block(h_out, target=4)
    shifts = ((w - t.cx0.astype(np.int64)) % w).astype(np.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(b, h_out // rblk),
        in_specs=[
            pl.BlockSpec((1, h_pad, w, c), lambda bb, ii, *r: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rblk, w, f), lambda bb, ii, *r: (bb, ii, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k2 * c, f), lambda bb, ii, *r: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    body = functools.partial(_dk_kernel, k2, rblk, w, c, f)
    return pl.pallas_call(
        body, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k2 * c, f), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h_out * w * k2 * c * f,
            bytes_accessed=b * h_pad * w * c * 4 + b * h_out * w * f * 4,
            transcendentals=0),
    )(jnp.asarray(t.y0), jnp.asarray(t.y1), jnp.asarray(shifts),
      jnp.asarray(t.wy), jnp.asarray(t.wx),
      xp, g.astype(jnp.float32))


def _pallas_dx(g, kernel, *, kernel_size: int, dilation_rate: int,
               skydome: bool, x_shape):
    b, h, w, c = x_shape
    k2 = kernel_size * kernel_size
    f = kernel.shape[-1]
    st = scatter_tables(h, w, kernel_size, 1, dilation_rate, skydome)
    h_out = g.shape[1]
    rblk = _row_block(h, target=4)
    # K^T stacked per tap: [k2*f, c].
    kt = kernel.astype(jnp.float32).reshape(k2, c, f).transpose(0, 2, 1)
    kt = kt.reshape(k2 * f, c)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(b, h // rblk),
        in_specs=[
            pl.BlockSpec((1, h_out, w, f), lambda bb, ii, *r: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2 * f, c), lambda bb, ii, *r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rblk, w, c),
                               lambda bb, ii, *r: (bb, ii, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    body = functools.partial(_dx_kernel, st.nrefs, rblk, w, c, f)
    return pl.pallas_call(
        body, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * st.nrefs * w * c * f,
            bytes_accessed=b * h_out * w * f * 4 + b * h * w * c * 4,
            transcendentals=0),
    )(jnp.asarray(st.ri), jnp.asarray(st.rt), jnp.asarray(st.rw),
      jnp.asarray(st.rcx), jnp.asarray(st.rwx),
      g.astype(jnp.float32), kt)


def pallas_bwd_supported(x_shape, g_shape, kernel_size: int = 3) -> bool:
    """Both bwd kernels keep one sample's image/cotangent block in VMEM."""
    b, h, w, c = x_shape
    f = g_shape[-1]
    if _store_dtype(x_shape, kernel_size) is None or w < 8:
        return False
    g_bytes = g_shape[1] * w * f * 4
    return g_bytes <= _VMEM_F32_BUDGET * 2


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _da_conv_core(x, kernel, bias, kernel_size, dilation_rate, skydome):
    out = _pallas_forward(x, kernel, kernel_size=kernel_size,
                          dilation_rate=dilation_rate, skydome=skydome)
    return (out + bias).astype(x.dtype)


def _da_fwd(x, kernel, bias, kernel_size, dilation_rate, skydome):
    return (_da_conv_core(x, kernel, bias, kernel_size, dilation_rate,
                          skydome),
            (x, kernel, bias))


def _da_bwd(kernel_size, dilation_rate, skydome, res, g):
    x, kernel, bias = res
    if pallas_bwd_supported(x.shape, g.shape, kernel_size):
        g32 = g.astype(jnp.float32)
        dx = _pallas_dx(g32, kernel, kernel_size=kernel_size,
                        dilation_rate=dilation_rate, skydome=skydome,
                        x_shape=x.shape).astype(x.dtype)
        dk = _pallas_dk(x, g32, kernel_size=kernel_size,
                        dilation_rate=dilation_rate, skydome=skydome,
                        f=kernel.shape[-1]).astype(kernel.dtype)
        db = jnp.sum(g32, axis=(0, 1, 2)).astype(bias.dtype)
        return dx, dk, db
    _, vjp = jax.vjp(
        lambda xx, kk, bb: deformable_conv2d(
            xx, kk, bb, kernel_size=kernel_size, stride=1,
            dilation_rate=dilation_rate, skydome=skydome),
        x, kernel, bias,
    )
    return vjp(g)


_da_conv_core.defvjp(_da_fwd, _da_bwd)


def deformable_conv2d_pallas(x, kernel, bias, *, kernel_size: int = 3,
                             stride: int = 1, dilation_rate: int = 1,
                             skydome: bool = True):
    """Drop-in for skyhdr.ops.distortion.deformable_conv2d (stride 1);
    falls back to the XLA path when the image block won't fit VMEM."""
    if not pallas_supported(x.shape, kernel_size, stride):
        return deformable_conv2d(x, kernel, bias, kernel_size=kernel_size,
                                 stride=stride, dilation_rate=dilation_rate,
                                 skydome=skydome)
    return _da_conv_core(x, kernel, bias, kernel_size, dilation_rate, skydome)
