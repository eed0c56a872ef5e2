"""Fused Pallas kernel for the distortion-aware equirectangular conv.

What the XLA path (skyhdr.ops.distortion.deformable_conv2d) still pays for:
each of the k^2 taps materializes a [B, H, W, C] gathered temporary in HBM
before its matmul. This kernel keeps one sample's padded image resident in
VMEM and, per output row, does the whole tap pipeline on-chip.

The k=3 fast path applies three MXU/VPU restructurings on top (each
measured on the v5e; see tools/exp_daconv.py and CLAUDE.md):

  * ROW DEDUP + SCRATCH SHIFTS: the y tables depend only on the kernel row
    (ky), so ONE y-interp serves the 3 taps of a kernel row (6 row loads +
    one doubled-scratch write per output row instead of 18 loads); the
    cyclic column shift of each tap is a dynamic-slice read of the doubled
    row in VMEM scratch (dbl[cx:cx+w] IS the shift) — measured 2.8 ms
    faster than pltpu.roll at (32,64,256,64): a dynamic-offset VMEM read
    is near-free while a roll is real sublane data movement.
  * SAMPLE PACKING (c <= 64): P samples' channels are packed onto the
    128-lane axis (an XLA transpose in HBM, once per call) and the weights
    become block-diagonal [k2*P*c, P*f] — K and N both grow P-fold, so the
    number of MXU M-streams drops P-fold. The kernel was M-stream bound at
    25% MXU utilization for c=f=64; packing doubles both tile dims.
  * M-BLOCKING (w < 256): mblk rows' tap samples are sublane-concatenated
    (aligned, no lane-offset RMW) into ONE [mblk*w, Pc] matmul per tap,
    amortizing MXU pipeline latency over longer streams.

Index tables (per-row y0/y1/cx/wy/wx from skyhdr.ops.distortion.
gather_tables) arrive via scalar prefetch so row addressing is resolved
before the body runs. Grid is (B/P, H_out/rblk) with the image block's
index map constant in the row dimension — the HBM->VMEM fetch happens once
per (packed) sample.

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
                                   scatter_tables, scatter_tables_k3)

# VMEM budgets for the resident image block (bytes). The pipeline
# double-buffers the block, so the effective footprint is ~2x; above the
# f32 budget the block is stored bf16 (compute stays f32), above the bf16
# budget we fall back to the XLA path.
_VMEM_F32_BUDGET = 3 * 1024 * 1024
_VMEM_BF16_BUDGET = 6 * 1024 * 1024


def _sample_pack(b: int, c: int) -> int:
    """Samples packed per lane group: largest power of 2 with P*c <= 128
    and P | b."""
    p = 1
    while p * 2 * c <= 128 and b % (p * 2) == 0:
        p *= 2
    return p


def _m_block(w: int, h_out: int) -> int:
    """Rows whose samples are stacked per matmul: M = mblk*w targets 256."""
    mblk = 1
    while w * mblk * 2 <= 256 and h_out % (mblk * 2) == 0:
        mblk *= 2
    return mblk


def _mm_dtype(x):
    """Matmul operand dtype. bf16 operands are kept for dtype consistency
    with the model-wide bf16 compute mode, not for speed: on the shapes this
    kernel actually serves (c*p <= 128, e.g. the packed (32,64,256,64)
    deconvs and the c=128 resblock convs) bf16 measured NEUTRAL on the
    forward (3.95 vs 3.75 ms) and ~5% faster on the backward — the critical
    path is VPU interp + scratch traffic, not MXU rate (CLAUDE.md, Known
    perf headroom). The bilinear interp stays f32; only the gathered sample
    and the weights are rounded."""
    return jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32


def _block_store_dtype(f32_bytes: int):
    if f32_bytes <= _VMEM_F32_BUDGET:
        return jnp.float32
    if f32_bytes // 2 <= _VMEM_BF16_BUDGET:
        return jnp.bfloat16
    return None


def _store_dtype(x_shape, kernel_size: int, p: int = 1):
    """Storage dtype for the VMEM-resident (possibly lane-packed) image
    block."""
    b, h, w, c = x_shape
    pad = (kernel_size - 1) // 2
    return _block_store_dtype((h + 2 * pad) * w * c * p * 4)


def pallas_supported(x_shape, kernel_size: int = 3, stride: int = 1) -> bool:
    b, h, w, c = x_shape
    p = _sample_pack(b, c) if kernel_size == 3 else 1
    # c (packed pc) caps at one lane tile: the column-shift scratch reads
    # are dynamic-sublane-offset vector loads, which Mosaic only compiles
    # at <= 128 lanes ("cannot statically prove that index in dimension 0
    # is a multiple of 8" at 256). The model's DA layers are all <= 128
    # channels (reference generator.py:60-66); wider shapes fall back to
    # the XLA gather path.
    return (stride == 1 and w >= 8 and c * max(p, 1) <= 128
            and _store_dtype(x_shape, kernel_size, p) is not None)


def _pack_samples(x, p: int):
    """[B,H,W,C] -> [B/P,H,W,P*C]: sample b lands in lane block b % P of
    packed sample b // P."""
    b, h, w, c = x.shape
    return (x.reshape(b // p, p, h, w, c)
             .transpose(0, 2, 3, 1, 4)
             .reshape(b // p, h, w, p * c))


def _unpack_samples(y, p: int):
    bp, h, w, pf = y.shape
    f = pf // p
    return (y.reshape(bp, h, w, p, f)
             .transpose(0, 3, 1, 2, 4)
             .reshape(bp * p, h, w, f))


def _blockdiag_kernel(kernel, k2: int, c: int, f: int, p: int):
    """[k2*c, f] -> block-diagonal [k2*p*c, p*f] so one matmul applies the
    shared weights to p lane-packed samples."""
    kb = jnp.zeros((k2, p * c, p * f), kernel.dtype)
    kt = kernel.reshape(k2, c, f)
    for i in range(p):
        kb = kb.at[:, i * c:(i + 1) * c, i * f:(i + 1) * f].set(kt)
    return kb.reshape(k2 * p * c, p * f)


def _kernel_body(k2: int, rblk: int, w: int, c: int, f: int,
                 y0_ref, y1_ref, cx_ref, wy_ref, wx_ref,
                 x_ref, k_ref, out_ref, dbl_ref):
    i0 = pl.program_id(1) * rblk
    mmdt = k_ref.dtype  # bf16 weights -> native-rate MXU (see _mm_dtype)

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
            acc += jnp.dot(sample.astype(mmdt),
                           k_ref[t * c:(t + 1) * c, :],
                           preferred_element_type=jnp.float32)

        out_ref[0, r] = acc.astype(out_ref.dtype)


def _kernel_k3(rblk: int, mblk: int, w: int, c: int, f: int,
               y0_ref, y1_ref, wy_ref, cx_ref, wx_ref,
               x_ref, k_ref, out_ref, *dbl_refs):
    """k=3 fast path: row dedup, doubled-scratch column shifts, M-blocked
    matmuls. c/f here are the PACKED channel counts (P*c_in, P*f_out).

    Column shifts read a DOUBLED copy of rowy from VMEM scratch via
    dynamic-slice (dbl[cx:cx+w] IS the cyclic shift) instead of
    pltpu.roll — measured 2.8 ms faster at (32,64,256,64) once the
    per-iteration-blocking timer artifact was fixed (tools/exp_daconv.py,
    2026-08-17): a dynamic-offset VMEM read is near-free, a roll is real
    sublane data movement.

    The packed layout arrives via an HBM transpose (_pack_samples, ~2 ms
    at (32,64,256,64)). In-kernel packing of UNPACKED (p,h,w,c) blocks was
    tried and rejected: a c=64 block pays 2x VMEM for lane-tile padding
    and overflows the 16M scoped-vmem limit (tools/exp_pack.py notes).

    One scratch buffer PER mblk row: a shared [2*w*mblk, c] scratch needs
    dynamic offsets of the form 2*w*r + cx, which Mosaic cannot
    alignment-prove for multi-lane-tile rows (c > 128 fails with 'index in
    dimension 0 is a multiple of 8'); a pure-cx offset into a per-row
    [2*w, c] buffer compiles at every supported width."""
    i0 = pl.program_id(1) * rblk
    for g in range(rblk // mblk):
        ig = i0 + g * mblk
        acc = jnp.zeros((mblk * w, f), jnp.float32)
        for ky in range(3):
            for r in range(mblk):
                y0 = y0_ref[ig + r, ky]
                y1 = y1_ref[ig + r, ky]
                wy = wy_ref[ig + r, ky]
                row0 = x_ref[0, y0, :, :].astype(jnp.float32)
                row1 = x_ref[0, y1, :, :].astype(jnp.float32)
                rowy = (1.0 - wy) * row0 + wy * row1
                dbl_refs[r][0:w, :] = rowy
                dbl_refs[r][w:2 * w, :] = rowy
            for kx in range(3):
                t = 3 * ky + kx
                ss = []
                for r in range(mblk):
                    cx = cx_ref[ig + r, t]
                    wx = wx_ref[ig + r, t]
                    g0 = dbl_refs[r][pl.ds(cx, w), :]
                    g1 = dbl_refs[r][pl.ds(cx + 1, w), :]
                    ss.append((1.0 - wx) * g0 + wx * g1)
                smp = ss[0] if mblk == 1 else jnp.concatenate(ss, axis=0)
                acc += jnp.dot(smp.astype(k_ref.dtype),
                               k_ref[t * c:(t + 1) * c, :],
                               preferred_element_type=jnp.float32)
        out_ref[0, pl.ds(g * mblk, mblk)] = (
            acc.reshape(mblk, w, f).astype(out_ref.dtype))


def _forward_k3(x, kernel, *, dilation_rate: int, skydome: bool,
                interpret: bool = False):
    """k=3 fast path (dedup + pack + M-block). Exact same arithmetic as the
    generic kernel — the restructurings only regroup loads and matmuls."""
    b, h, w, c = x.shape
    k2 = 9
    f = kernel.shape[-1]
    t = gather_tables(h, w, 3, 1, dilation_rate, skydome)
    h_out = t.y0.shape[0]
    p = _sample_pack(b, c)
    store = _store_dtype(x.shape, 3, p) or jnp.float32

    xk = x if p == 1 else _pack_samples(x, p)
    xp = jnp.pad(xk, ((0, 0), (t.pad, t.pad), (0, 0), (0, 0))).astype(store)
    h_pad = xp.shape[1]
    pc, pf = p * c, p * f
    mmdt = _mm_dtype(x)
    kb = (kernel.astype(mmdt) if p == 1 else
          _blockdiag_kernel(kernel.astype(mmdt), k2, c, f, p))

    mblk = _m_block(w, h_out)
    rblk = mblk if mblk > 1 else (2 if h_out % 2 == 0 else 1)

    # ky-major tables: y0/y1/wy are constant across kx -> [h_out, 3].
    y0 = np.ascontiguousarray(t.y0.reshape(h_out, 3, 3)[:, :, 0])
    y1 = np.ascontiguousarray(t.y1.reshape(h_out, 3, 3)[:, :, 0])
    wy = np.ascontiguousarray(t.wy.reshape(h_out, 3, 3)[:, :, 0])

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
        scratch_shapes=[pltpu.VMEM((2 * w, pc), jnp.float32)
                        for _ in range(mblk)],
    )
    body = functools.partial(_kernel_k3, rblk, mblk, w, pc, pf)
    out = pl.pallas_call(
        body, grid_spec=grid_spec, interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((b // p, h_out, w, pf), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h_out * w * k2 * c * f,
            bytes_accessed=b * h_pad * w * c * 4 + b * h_out * w * f * 4,
            transcendentals=0),
    )(jnp.asarray(y0), jnp.asarray(y1), jnp.asarray(wy),
      jnp.asarray(t.cx0), jnp.asarray(t.wx), xp, kb)
    return out if p == 1 else _unpack_samples(out, p)


def _dedup_valid(t) -> bool:
    """The k=3 fast path needs the y tables constant across kx."""
    h_out = t.y0.shape[0]
    for arr in (t.y0, t.y1, t.wy):
        a = arr.reshape(h_out, 3, 3)
        if not np.all(a == a[:, :, :1]):
            return False
    return True


def _pallas_forward(x, kernel, *, kernel_size: int, dilation_rate: int,
                    skydome: bool, interpret: bool = False):
    b, h, w, c = x.shape
    k2 = kernel_size * kernel_size
    f = kernel.shape[-1]
    t = gather_tables(h, w, kernel_size, 1, dilation_rate, skydome)
    if (kernel_size == 3 and t.y0.shape[0] % 2 == 0 and _dedup_valid(t)):
        return _forward_k3(x, kernel, dilation_rate=dilation_rate,
                           skydome=skydome, interpret=interpret)
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
        grid_spec=grid_spec, interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((b, h_out, w, f), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h_out * w * k2 * c * f,
            bytes_accessed=b * h_pad * w * c * 4 + b * h_out * w * f * 4,
            transcendentals=0,
        ),
    )(
        jnp.asarray(t.y0), jnp.asarray(t.y1), jnp.asarray(t.cx0),
        jnp.asarray(t.wy), jnp.asarray(t.wx),
        xp, kernel.astype(_mm_dtype(x)),
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
# Cyclic shifts (forward and adjoint) are dynamic-slice reads of a doubled
# row in 2-D VMEM scratch — Mosaic supports dynamic sublane starts only on
# <=2-D refs, and this beats pltpu.roll by ~2.8 ms at (32,64,256,64).
# ---------------------------------------------------------------------------


def _dk_kernel(k2, rblk, w, c, f,
               y0_ref, y1_ref, cx_ref, wy_ref, wx_ref,
               x_ref, g_ref, out_ref, dbl_ref):
    i0 = pl.program_id(1) * rblk
    accs = [jnp.zeros((c, f), jnp.float32) for _ in range(k2)]
    for r in range(rblk):
        i = i0 + r
        g_row = g_ref[0, r].astype(jnp.float32)  # [w, f]
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
            g0 = dbl_ref[pl.ds(cx, w), :]      # g0[j] = rowy[(j+cx) mod w]
            g1 = dbl_ref[pl.ds(cx + 1, w), :]
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
               g_ref, kt_ref, out_ref, dbl_ref):
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
            dbl_ref[0:w, :] = g_row
            dbl_ref[w:2 * w, :] = g_row
            # Adjoint shifts: r0[j] = g[(j-cx) mod w] = dbl[j + w - cx],
            # r1[j] = g[(j-cx-1) mod w] = dbl[j + w - cx - 1].
            r0 = dbl_ref[pl.ds(w - cx, w), :]
            r1 = dbl_ref[pl.ds(w - cx - 1, w), :]
            u = wgt * ((1.0 - wx) * r0 + wx * r1)
            start = t * f
            if f % 8 == 0:  # help Mosaic prove sublane alignment
                start = pl.multiple_of(start, 8)
            acc += jnp.dot(u, kt_ref[pl.ds(start, f), :],
                           preferred_element_type=jnp.float32)
        out_ref[0, r] = acc.astype(out_ref.dtype)


def _dk_k3_kernel(rblk, w, c, f,
                  y0_ref, y1_ref, wy_ref, cx_ref, wx_ref,
                  x_ref, g_ref, out_ref, dbl_ref):
    """dK fast path: forward-gather remat with row dedup + doubled-scratch
    column shifts (6 loads + 3 scratch doublings per row; no rolls)."""
    i0 = pl.program_id(1) * rblk
    accs = [jnp.zeros((c, f), jnp.float32) for _ in range(9)]
    for r in range(rblk):
        i = i0 + r
        g_row = g_ref[0, r].astype(jnp.float32)           # [w, f]
        for ky in range(3):
            y0 = y0_ref[i, ky]
            y1 = y1_ref[i, ky]
            wy = wy_ref[i, ky]
            row0 = x_ref[0, y0, :, :].astype(jnp.float32)
            row1 = x_ref[0, y1, :, :].astype(jnp.float32)
            rowy = (1.0 - wy) * row0 + wy * row1
            dbl_ref[0:w, :] = rowy
            dbl_ref[w:2 * w, :] = rowy
            for kx in range(3):
                t = 3 * ky + kx
                cx = cx_ref[i, t]
                wx = wx_ref[i, t]
                g0 = dbl_ref[pl.ds(cx, w), :]
                g1 = dbl_ref[pl.ds(cx + 1, w), :]
                smp = (1.0 - wx) * g0 + wx * g1
                accs[t] += jax.lax.dot_general(
                    smp, g_row, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
    dk = jnp.concatenate(accs, axis=0)                    # [9c, f]

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        out_ref[...] = dk

    @pl.when((pl.program_id(0) > 0) | (pl.program_id(1) > 0))
    def _acc():
        out_ref[...] += dk


def _dx_k3_kernel(nslots, rblk, w, c, f,
                  si_ref, sw_ref, sky_ref, scx_ref, swx_ref,
                  g_ref, kt_ref, out_ref, dbl_ref):
    """dx fast path: slot-grouped scatter inverse (<=7 cotangent-row loads
    per input row instead of <=21) with doubled-scratch adjoint shifts;
    c/f are the PACKED channel counts."""
    y0 = pl.program_id(1) * rblk
    for r in range(rblk):
        y = y0 + r
        acc = jnp.zeros((w, c), jnp.float32)
        for s in range(nslots):
            i = si_ref[y, s]
            wgt = sw_ref[y, s]      # 0 for slot padding (harmless extra ops)
            ky = sky_ref[y, s]
            g = g_ref[0, i].astype(jnp.float32)           # [w, f]
            dbl_ref[0:w, :] = g
            dbl_ref[w:2 * w, :] = g
            for kx in range(3):
                cx = scx_ref[y, 3 * s + kx]
                wx = swx_ref[y, 3 * s + kx]
                # u[j] = (1-wx)*g[(j-cx)%w] + wx*g[(j-cx-1)%w], times wgt:
                r0 = dbl_ref[pl.ds(w - cx, w), :]
                r1 = dbl_ref[pl.ds(w - cx - 1, w), :]
                u = (wgt - wgt * wx) * r0 + (wgt * wx) * r1
                start = (3 * ky + kx) * f
                if f % 8 == 0:
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
               f: int, interpret: bool = False):
    b, h, w, c = x.shape
    k2 = kernel_size * kernel_size
    t = gather_tables(h, w, kernel_size, 1, dilation_rate, skydome)
    h_out = t.y0.shape[0]
    store = _store_dtype(x.shape, kernel_size) or jnp.float32
    xp = jnp.pad(x, ((0, 0), (t.pad, t.pad), (0, 0), (0, 0))).astype(store)
    h_pad = xp.shape[1]
    rblk = _row_block(h_out, target=4)

    fast = kernel_size == 3 and _dedup_valid(t)
    if fast:
        y0 = np.ascontiguousarray(t.y0.reshape(h_out, 3, 3)[:, :, 0])
        y1 = np.ascontiguousarray(t.y1.reshape(h_out, 3, 3)[:, :, 0])
        wy = np.ascontiguousarray(t.wy.reshape(h_out, 3, 3)[:, :, 0])
        body = functools.partial(_dk_k3_kernel, rblk, w, c, f)
        scalars = (y0, y1, wy, t.cx0, t.wx)
    else:
        body = functools.partial(_dk_kernel, k2, rblk, w, c, f)
        scalars = (t.y0, t.y1, t.cx0, t.wy, t.wx)

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
        scratch_shapes=[pltpu.VMEM((2 * w, c), jnp.float32)],
    )
    return pl.pallas_call(
        body, grid_spec=grid_spec, interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((k2 * c, f), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h_out * w * k2 * c * f,
            bytes_accessed=b * h_pad * w * c * 4 + b * h_out * w * f * 4,
            transcendentals=0),
    )(*(jnp.asarray(s) for s in scalars), xp, g.astype(jnp.float32))


def _pallas_dx(g, kernel, *, kernel_size: int, dilation_rate: int,
               skydome: bool, x_shape, interpret: bool = False):
    b, h, w, c = x_shape
    k2 = kernel_size * kernel_size
    f = kernel.shape[-1]
    h_out = g.shape[1]
    rblk = _row_block(h, target=4)

    t = gather_tables(h, w, kernel_size, 1, dilation_rate, skydome)
    if kernel_size == 3 and _dedup_valid(t):
        # Fast path: slot-grouped tables + sample packing (lane-packed
        # cotangent against a block-diagonal K^T — halves the MXU streams).
        # The cotangent block is stored bf16 when the packed block exceeds
        # the f32 budget — consistent with the forward's bf16 x storage at
        # the same shapes.
        st = scatter_tables_k3(h, w, 1, dilation_rate, skydome)
        p = _sample_pack(b, max(c, f))
        gstore = _block_store_dtype(h_out * w * f * p * 4) or jnp.float32
        gk = g.astype(gstore) if p == 1 else _pack_samples(
            g.astype(gstore), p)
        pc, pf = p * c, p * f
        ktp = kernel.astype(jnp.float32).reshape(k2, c, f).transpose(0, 2, 1)
        ktp = ktp.reshape(k2 * f, c)
        if p > 1:
            ktp = _blockdiag_kernel(ktp, k2, f, c, p)
        body = functools.partial(_dx_k3_kernel, st.nslots, rblk, w, pc, pf)
        scalars = (st.si, st.sw, st.sky, st.scx, st.swx)
        out = pl.pallas_call(
            body, interpret=interpret,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=5,
                grid=(b // p, h // rblk),
                in_specs=[
                    pl.BlockSpec((1, h_out, w, pf),
                                 lambda bb, ii, *r: (bb, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((k2 * pf, pc), lambda bb, ii, *r: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, rblk, w, pc),
                                       lambda bb, ii, *r: (bb, ii, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((2 * w, pf), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((b // p, h, w, pc), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * h * st.nslots * 3 * w * c * f,
                bytes_accessed=b * h_out * w * f * 4 + b * h * w * c * 4,
                transcendentals=0),
        )(*(jnp.asarray(s) for s in scalars), gk, ktp)
        return out if p == 1 else _unpack_samples(out, p)

    st = scatter_tables(h, w, kernel_size, 1, dilation_rate, skydome)
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
        scratch_shapes=[pltpu.VMEM((2 * w, f), jnp.float32)],
    )
    body = functools.partial(_dx_kernel, st.nrefs, rblk, w, c, f)
    return pl.pallas_call(
        body, grid_spec=grid_spec, interpret=interpret,
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
    if max(c, f) > 128:  # dynamic-offset scratch loads cap at one lane
        return False     # tile (see pallas_supported)
    if kernel_size == 3:
        p = _sample_pack(b, max(c, f))
        return _block_store_dtype(g_shape[1] * w * f * p * 4) is not None
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
