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

Training uses a custom VJP whose backward runs the (differentiable) XLA
path — inference (the serving-critical path) gets the fused kernel, the
backward pass reuses XLA's autodiff of the equivalent computation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from skyhdr.ops.distortion import deformable_conv2d, gather_tables

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
