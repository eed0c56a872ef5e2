"""Distortion-aware (deformable equirectangular) convolution — the paper's
signature op (reference distortion_aware_ops.py) redesigned TPU-first.

Geometry (reference distortion_aware_ops.py:198-270): for each panorama row,
project the k x k kernel grid onto the sphere's tangent plane at that row's
elevation and re-project to pixel space; the resulting sampling offsets
depend ONLY on the row (and tap), never on the column. The reference builds
this table with nested Python loops of scalar TF ops; here it is vectorized
NumPy computed once per (h, w, k, dilation) and cached.

Execution redesign: the reference gathers a [B, H*W, k^2*C] tensor and
applies the kernel as one huge matmul (distortion_aware_ops.py:115-121),
materializing a k^2-times-blown-up activation. Because the offsets are
column-independent, each tap's bilinear sample is just
    img[(row-gather), (column + static shift) mod W]
i.e. four structured gathers with static index matrices, multiplied by
static per-row bilinear weights. We accumulate tap-by-tap:
    out = sum_t  sample_t(x) @ K_t
so peak memory stays at one [B, H, W, C] temporary per corner and every
contraction is an MXU matmul. A fused Pallas kernel (skyhdr.ops.pallas)
removes even that temporary.

Boundary semantics: width wraps cylindrically (true 360 degrees; the
reference wraps modulo the *zero-padded* width, distortion_aware_ops.py:76,
which skips across pad columns — an artifact we deliberately fix). Height is
zero-padded by k//2 like the reference's _pad_input (125-150).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

PI = np.pi


@functools.lru_cache(maxsize=None)
def distortion_offsets(h: int, w: int, kernel_size: int = 3,
                       dilation_rate: int = 1, skydome: bool = True) -> np.ndarray:
    """[h, k^2, 2] per-row (dy, dx) sampling offsets relative to the window's
    own tap position. Vectorized equivalent of reference
    distortion_aware_ops.py:186-270 (make_grid + distortion)."""
    k = kernel_size
    assert k % 2 == 1, "kernel_size must be odd (reference distortion_aware_ops.py:188)"
    middle = (k // 2) * (k + 1)

    unit_w = 2.0 * PI / w
    unit_h = PI / (h * 2 if skydome else h)
    rho = np.tan(unit_w) * dilation_rate

    # Tap grid, y (slow) and x (fast) both from +r to -r
    # (reference make_grid, distortion_aware_ops.py:186-196).
    r = k // 2
    gy, gx = np.meshgrid(np.arange(r, -r - 1, -1), np.arange(r, -r - 1, -1),
                         indexing="ij")
    grid = np.stack([gx.ravel(), gy.ravel()], axis=-1).astype(np.float64)  # [k2,(x,y)]

    x_c = int(w * 0.5)
    y_rows = np.arange(h, dtype=np.float64)
    theta = (x_c - 0.5 * w) * unit_w  # == 0 at the center column
    phi = (h - y_rows) * unit_h if skydome else (h * 0.5 - y_rows) * unit_h

    # Unit sphere point per row and its tangent basis (t_x = v x p, t_y = p x t_x).
    p_u = np.stack([np.cos(phi) * np.cos(theta), np.sin(phi),
                    np.cos(phi) * np.sin(theta)], axis=-1)  # [h, 3]
    v = np.array([0.0, 1.0, 0.0])
    t_x = np.cross(np.broadcast_to(v, p_u.shape), p_u)
    t_y = np.cross(p_u, t_x)

    # Tangent-plane displacement per (row, tap) and re-projection.
    disp = rho * (grid[None, :, 0:1] * t_x[:, None, :] +
                  grid[None, :, 1:2] * t_y[:, None, :])  # [h, k2, 3]
    p_ur = p_u[:, None, :] + disp

    ux, uy, uz = p_ur[..., 0], p_ur[..., 1], p_ur[..., 2]
    theta_r = np.arctan2(uz, ux)
    # Branch rotation for ux<0 (reference distortion_aware_ops.py:239-252).
    theta_r = np.where(ux < 0, np.where(uz >= 0, theta_r + PI, theta_r - PI), theta_r)
    phi_r = np.arcsin(np.clip(uy, -1.0, 1.0))

    x_r = (theta_r / PI + 1.0) * 0.5 * w
    y_r = (1.0 - 2.0 * phi_r / PI) * h if skydome else (0.5 - phi_r / PI) * h

    kpts = np.stack([y_r, x_r], axis=-1)  # [h, k2, (y, x)]
    offset = kpts - kpts[:, middle:middle + 1, :]
    return offset.astype(np.float32)


class GatherTables(NamedTuple):
    """Static per-(row, tap) sampling tables for the structured gather."""

    y0: np.ndarray  # [h_out, k2] int32, padded-row index of the floor sample
    y1: np.ndarray  # [h_out, k2] int32
    cx0: np.ndarray  # [h_out, k2] int32, column shift of the floor sample
    cx1: np.ndarray  # [h_out, k2] int32
    wy: np.ndarray  # [h_out, k2] f32, fractional weight toward y1
    wx: np.ndarray  # [h_out, k2] f32, fractional weight toward x1
    pad: int
    h_pad: int


@functools.lru_cache(maxsize=None)
def gather_tables(h: int, w: int, kernel_size: int = 3, stride: int = 1,
                  dilation_rate: int = 1, skydome: bool = True) -> GatherTables:
    """Turn the float offset table into integer gather indices + bilinear
    weights. Replicates the index arithmetic of reference
    distortion_aware_ops.py:50-123 with true cylindrical width wrap."""
    k = kernel_size
    pad = (k - 1) // 2
    h_out = (h + stride - 1) // stride
    off = distortion_offsets(h_out, w, k, dilation_rate, skydome).astype(np.float64)
    dy, dx = off[..., 0], off[..., 1]  # [h_out, k2]

    ty = np.repeat(np.arange(k), k)[None, :].astype(np.float64)  # tap row 0..k-1
    tx = np.tile(np.arange(k), k)[None, :].astype(np.float64)

    i = np.arange(h_out, dtype=np.float64)[:, None]
    # Absolute padded-row coordinate of the sample for output row i, tap t.
    yf = i * stride + ty + dy
    h_pad = h + 2 * pad
    yf = np.clip(yf, 0.0, h_pad - 1)  # reference clips y (line 73)
    y0 = np.floor(yf)
    wy = yf - y0
    y1 = np.minimum(y0 + 1, h_pad - 1)

    # Column shift relative to j*stride (column-independent).
    xf = tx - pad + dx
    x0 = np.floor(xf)
    wx = xf - x0
    x1 = x0 + 1.0  # wrapped modulo w at apply time

    return GatherTables(
        y0=y0.astype(np.int32), y1=y1.astype(np.int32),
        cx0=(x0 % w).astype(np.int32), cx1=(x1 % w).astype(np.int32),
        wy=wy.astype(np.float32), wx=wx.astype(np.float32),
        pad=pad, h_pad=h_pad,
    )


class ScatterTables(NamedTuple):
    """Static inverse of GatherTables: for every *input* row y (unpadded
    coordinates), the padded list of forward references (i, tap) that read
    it, with their interpolation weights. Turns the adjoint's row
    scatter-add into a per-input-row gather — the TPU-friendly form of the
    DA-conv backward (scatters don't vectorize on TPU; gathers with static
    tables do). max refs/row is 21 for k=3 at every supported resolution.
    """

    ri: np.ndarray   # [h, R] int32 — forward output row i
    rt: np.ndarray   # [h, R] int32 — tap index
    rw: np.ndarray   # [h, R] f32 — row weight: (1-wy) if y==y0 else wy; 0=pad
    rcx: np.ndarray  # [h, R] int32 — column shift cx0(i, tap)
    rwx: np.ndarray  # [h, R] f32 — column fraction wx(i, tap)
    nrefs: int


@functools.lru_cache(maxsize=None)
def scatter_tables(h: int, w: int, kernel_size: int = 3, stride: int = 1,
                   dilation_rate: int = 1, skydome: bool = True) -> ScatterTables:
    t = gather_tables(h, w, kernel_size, stride, dilation_rate, skydome)
    h_out = t.y0.shape[0]
    k2 = kernel_size * kernel_size
    refs = [[] for _ in range(h)]  # unpadded row index
    for i in range(h_out):
        for tap in range(k2):
            wy = float(t.wy[i, tap])
            for y_pad, wgt in ((int(t.y0[i, tap]), 1.0 - wy),
                               (int(t.y1[i, tap]), wy)):
                y = y_pad - t.pad
                if 0 <= y < h and wgt != 0.0:
                    refs[y].append((i, tap, wgt,
                                    int(t.cx0[i, tap]), float(t.wx[i, tap])))
    nrefs = max(len(r) for r in refs)
    ri = np.zeros((h, nrefs), np.int32)
    rt = np.zeros((h, nrefs), np.int32)
    rw = np.zeros((h, nrefs), np.float32)
    rcx = np.zeros((h, nrefs), np.int32)
    rwx = np.zeros((h, nrefs), np.float32)
    for y, lst in enumerate(refs):
        for r, (i, tap, wgt, cx, wx) in enumerate(lst):
            ri[y, r], rt[y, r], rw[y, r], rcx[y, r], rwx[y, r] = (
                i, tap, wgt, cx, wx)
    return ScatterTables(ri=ri, rt=rt, rw=rw, rcx=rcx, rwx=rwx, nrefs=nrefs)


class ScatterTablesK3(NamedTuple):
    """k=3 slot form of ScatterTables: refs grouped by (output row, kernel
    row). A slot's 3 kx taps share the forward row i, the row weight (wy
    depends only on ky) and the loaded cotangent row — so the dx kernel
    loads g ONCE per slot (<=7 slots/row) instead of once per ref (<=21).
    """

    si: np.ndarray   # [h, S] int32 — forward output row i (0 = pad)
    sw: np.ndarray   # [h, S] f32 — row weight; 0 marks slot padding
    sky: np.ndarray  # [h, S] int32 — kernel row ky of the slot
    scx: np.ndarray  # [h, S*3] int32 — column shift, kx-major per slot
    swx: np.ndarray  # [h, S*3] f32 — column fraction, kx-major per slot
    nslots: int


@functools.lru_cache(maxsize=None)
def scatter_tables_k3(h: int, w: int, stride: int = 1,
                      dilation_rate: int = 1,
                      skydome: bool = True) -> ScatterTablesK3:
    t = gather_tables(h, w, 3, stride, dilation_rate, skydome)
    h_out = t.y0.shape[0]
    slots = [[] for _ in range(h)]
    for i in range(h_out):
        for ky in range(3):
            tap0 = 3 * ky
            wy = float(t.wy[i, tap0])
            for y_pad, wgt in ((int(t.y0[i, tap0]), 1.0 - wy),
                               (int(t.y1[i, tap0]), wy)):
                y = y_pad - t.pad
                if 0 <= y < h and wgt != 0.0:
                    slots[y].append((i, wgt, ky,
                                     t.cx0[i, tap0:tap0 + 3],
                                     t.wx[i, tap0:tap0 + 3]))
    nslots = max(len(s) for s in slots)
    si = np.zeros((h, nslots), np.int32)
    sw = np.zeros((h, nslots), np.float32)
    sky = np.zeros((h, nslots), np.int32)
    scx = np.zeros((h, nslots, 3), np.int32)
    swx = np.zeros((h, nslots, 3), np.float32)
    for y, lst in enumerate(slots):
        for s, (i, wgt, ky, cxs, wxs) in enumerate(lst):
            si[y, s], sw[y, s], sky[y, s] = i, wgt, ky
            scx[y, s], swx[y, s] = cxs, wxs
    return ScatterTablesK3(si=si, sw=sw, sky=sky,
                           scx=scx.reshape(h, nslots * 3),
                           swx=swx.reshape(h, nslots * 3), nslots=nslots)


def deformable_conv2d(x, kernel, bias, *, kernel_size: int = 3, stride: int = 1,
                      dilation_rate: int = 1, skydome: bool = True,
                      col_start=None, out_cols: int = None):
    """Distortion-aware conv of x [b, h, w, c] with kernel [k2*c, f].

    Functional core used by DAConv/DADeconv; jit-safe, all indices static.

    col_start/out_cols restrict the computation to `out_cols` output columns
    beginning at (possibly traced) column `col_start` — the hook used by
    width-sharded spatial parallelism (skyhdr.parallel.spatial), where each
    device holds the full gathered input but produces only its own shard of
    output columns.
    """
    b, h, w, c = x.shape
    k2 = kernel_size * kernel_size
    t = gather_tables(h, w, kernel_size, stride, dilation_rate, skydome)
    h_out = t.y0.shape[0]
    f = kernel.shape[-1]
    w_out = w if out_cols is None else out_cols

    xp = jnp.pad(x, ((0, 0), (t.pad, t.pad), (0, 0), (0, 0)))
    jcols = np.arange(w_out)[None, :] * stride  # [1, w_out]
    if col_start is not None:
        jcols = jcols + col_start * stride  # may become traced

    kern = kernel.reshape(k2, c, f)
    out = jnp.zeros((b, h_out, w_out, f), jnp.promote_types(x.dtype, jnp.float32))

    # Bilinear factorization: with x1 = x0+1 (mod w) and per-row-constant
    # shifts, the four corner gathers collapse to
    #   rowY  = (1-wy)*rows[y0] + wy*rows[y1]          (two row-takes)
    #   g0    = rowY[(j + cx0) mod w]                  (ONE 2-D gather)
    #   g1    = roll(g0, -1, axis=width)               (static roll)
    #   sample= (1-wx)*g0 + wx*g1
    # i.e. one expensive gather per tap instead of four.
    for tap in range(k2):
        wy = jnp.asarray(t.wy[:, tap])[None, :, None, None]
        wx = jnp.asarray(t.wx[:, tap])[None, :, None, None]
        row0 = jnp.take(xp, jnp.asarray(t.y0[:, tap]), axis=1)
        row1 = jnp.take(xp, jnp.asarray(t.y1[:, tap]), axis=1)
        row_y = (1 - wy) * row0 + wy * row1  # [b, h_out, w, c]

        xmat0 = (jcols + t.cx0[:, tap][:, None]) % w  # [h_out, w_out]
        imat = jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.int32, (h_out, w_out), 0),
            (h_out, w_out),
        )
        g0 = row_y[:, imat, xmat0, :]
        g1 = jnp.roll(g0, -1, axis=2) if out_cols is None else None
        if g1 is None:
            # Column-restricted mode: the +1 neighbor may live outside this
            # shard's columns, so gather it explicitly.
            xmat1 = (jcols + 1 + t.cx0[:, tap][:, None]) % w
            g1 = row_y[:, imat, xmat1, :]
        sample = (1 - wx) * g0 + wx * g1
        out = out + jnp.einsum(
            "bhwc,cf->bhwf", sample, kern[tap],
            preferred_element_type=jnp.float32,
        )

    out = out + bias
    return out.astype(x.dtype)


def _dispatch_da_conv(x, kernel, bias, *, kernel_size, stride, dilation_rate,
                      skydome, backend: str = "auto"):
    """Select the execution path: 'xla', 'pallas', 'sharded' (Pallas with
    custom_partitioning batch rules — required inside GSPMD-sharded jits,
    see skyhdr.ops.pallas.sharded), or 'auto' (Pallas on TPU when the
    image block fits VMEM, XLA otherwise)."""
    if backend == "sharded":
        from skyhdr.ops.pallas.sharded import deformable_conv2d_sharded

        return deformable_conv2d_sharded(
            x, kernel, bias, kernel_size=kernel_size, stride=stride,
            dilation_rate=dilation_rate, skydome=skydome,
        )
    if backend == "pallas" or (backend == "auto"
                               and jax.default_backend() != "cpu"):
        from skyhdr.ops.pallas.deform_conv import (deformable_conv2d_pallas,
                                                   pallas_supported)

        if backend == "pallas" or pallas_supported(x.shape, kernel_size, stride):
            return deformable_conv2d_pallas(
                x, kernel, bias, kernel_size=kernel_size, stride=stride,
                dilation_rate=dilation_rate, skydome=skydome,
            )
    return deformable_conv2d(
        x, kernel, bias, kernel_size=kernel_size, stride=stride,
        dilation_rate=dilation_rate, skydome=skydome,
    )


class DAConv(nn.Module):
    """Distortion-aware conv layer (reference distortion_aware_ops.py:5-123).

    Kernel shape [k^2*c_in, filters] matches the reference's flattened
    matmul form (distortion_aware_ops.py:30)."""

    filters: int
    kernel_size: int = 3
    strides: int = 1
    dilation_rate: int = 1
    skydome: bool = True
    backend: str = "auto"

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        k2 = self.kernel_size * self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.glorot_uniform(), (k2 * c, self.filters)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.filters,))
        return _dispatch_da_conv(
            x, kernel, bias,
            kernel_size=self.kernel_size, stride=self.strides,
            dilation_rate=self.dilation_rate, skydome=self.skydome,
            backend=self.backend,
        )


class DADeconv(nn.Module):
    """Resize-then-DA-conv (reference distortion_aware_ops.py:272-395)."""

    filters: int
    out_hw: Tuple[int, int] = (32, 128)
    kernel_size: int = 3
    dilation_rate: int = 1
    skydome: bool = True
    backend: str = "auto"

    @nn.compact
    def __call__(self, x):
        from skyhdr.ops.resize import resize_bilinear

        x = resize_bilinear(x, self.out_hw)
        c = x.shape[-1]
        k2 = self.kernel_size * self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.glorot_uniform(), (k2 * c, self.filters)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.filters,))
        return _dispatch_da_conv(
            x, kernel, bias,
            kernel_size=self.kernel_size, stride=1,
            dilation_rate=self.dilation_rate, skydome=self.skydome,
            backend=self.backend,
        )
