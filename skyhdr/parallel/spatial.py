"""Width-sharded spatial parallelism with cyclic halo exchange.

The panorama's width axis is periodic (360 degrees), so sharding it across
devices makes a ring the natural topology: every SAME conv needs its
neighbors' boundary columns, exchanged with lax.ppermute — the direct TPU
analog of ring/context parallelism (SURVEY.md §5), and exactly where the
reference's wraparound indexing lives (distortion_aware_ops.py:76-77).

Two ops:
  * ring_conv2d            — plain SAME conv under shard_map; halo columns
    travel one hop around the ring. padding='cyclic' gives true 360-degree
    wrap; padding='zeros' reproduces the reference's zero-padded seam.
  * ring_deformable_conv2d — the distortion-aware conv with BOUNDED
    ppermute halos. The column shifts do NOT grow unboundedly toward the
    zenith: the tangent basis t_x = v x p degenerates at the pole
    (skyhdr.ops.distortion.distortion_offsets), so the per-row max shift is
    small and static (3 columns at every supported resolution, k=3 d=1 —
    see ring_da_plan). Each device therefore exchanges only
    halo = max|shift|+1 columns per side with its ring neighbors; the
    all-gather strategy survives only as the fallback for configurations
    whose halo would exceed the local width (large dilation / tiny shards).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from skyhdr.ops.distortion import deformable_conv2d, gather_tables


def _exchange_halos(xl, pad: int, axis_name: str):
    """Cyclic exchange: returns (from_left, from_right) halo column blocks."""
    n = lax.axis_size(axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    from_left = lax.ppermute(xl[:, :, -pad:, :], axis_name, fwd)
    from_right = lax.ppermute(xl[:, :, :pad, :], axis_name, bwd)
    return from_left, from_right


def ring_conv2d(x, kernel, bias=None, *, mesh: Mesh, padding: str = "cyclic"):
    """SAME conv over a width-sharded [b, h, W, c] panorama.

    kernel: [kh, kw, cin, cout]. The width halo (kw-1)//2 is exchanged over
    the ring; height is zero-padded locally.
    """
    kh, kw, cin, cout = kernel.shape
    pad_w = (kw - 1) // 2
    pad_h = (kh - 1) // 2
    axis = "width"

    def local_fn(xl, k, b):
        if pad_w > 0:
            from_left, from_right = _exchange_halos(xl, pad_w, axis)
            if padding == "zeros":
                # Reference parity: the seam is zero-padded, not wrapped.
                idx = lax.axis_index(axis)
                n = lax.axis_size(axis)
                from_left = jnp.where(idx == 0, 0.0, from_left)
                from_right = jnp.where(idx == n - 1, 0.0, from_right)
            xl = jnp.concatenate([from_left, xl, from_right], axis=2)
        xl = jnp.pad(xl, ((0, 0), (pad_h, pad_h), (0, 0), (0, 0)))
        out = lax.conv_general_dilated(
            xl, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if b is not None:
            out = out + b
        return out

    mapped = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, None, "width", None), P(), P()),
        out_specs=P(None, None, "width", None),
    )
    return mapped(x, kernel, bias)


@functools.lru_cache(maxsize=None)
def ring_da_plan(h: int, w: int, w_local: int, kernel_size: int = 3,
                 dilation_rate: int = 1, skydome: bool = True):
    """Static communication plan for the width-sharded DA conv.

    Returns (mode, halo): mode == 'halo' when every per-row column shift
    fits a bounded neighbor exchange of `halo` columns per side
    (halo = max|signed shift| + 1, the +1 for the bilinear x1 neighbor),
    'gather' when the halo would exceed one shard's width (then only a full
    all-gather is correct — a halo spanning >1 hop is not exchanged)."""
    t = gather_tables(h, w, kernel_size, 1, dilation_rate, skydome)
    signed = ((t.cx0 + w // 2) % w) - w // 2
    halo = int(np.maximum(np.abs(signed), np.abs(signed + 1)).max())
    return ("halo" if halo <= w_local else "gather"), halo


def ring_deformable_conv2d(x, kernel, bias, *, mesh: Mesh,
                           kernel_size: int = 3, dilation_rate: int = 1,
                           skydome: bool = True, force_gather: bool = False):
    """Width-sharded distortion-aware conv over the `width` ring.

    x: [b, h, W, c] sharded over `width`; kernel [k^2*c, f].

    Default path ('halo' of ring_da_plan): exchange halo columns with both
    ring neighbors (2*halo*H*b*c bytes/device vs (W - W_local)*H*b*c for
    the all-gather — 7x less at W=64 over 8 devices), then evaluate the
    structured gather entirely locally: the per-(row, tap) column shift is
    device-independent, so the extended-coordinate index matrix
    j + halo + shift is static. The reference's wraparound
    (distortion_aware_ops.py:76-77) happens *physically* — the halos
    travel cyclically around the ring.
    """
    b, h, w, c = x.shape
    axis = "width"
    k2 = kernel_size * kernel_size
    f = kernel.shape[-1]
    t = gather_tables(h, w, kernel_size, 1, dilation_rate, skydome)
    h_out = t.y0.shape[0]
    # Signed column shift per (row, tap); static, device-independent.
    signed = ((t.cx0 + w // 2) % w) - w // 2
    w_local = w // mesh.shape[axis]
    mode, halo = ring_da_plan(h, w, w_local, kernel_size, dilation_rate,
                              skydome)

    if force_gather or mode == "gather":
        def gather_fn(xl, k, bias_):
            idx = lax.axis_index(axis)
            wl = xl.shape[2]
            full = lax.all_gather(xl, axis, axis=2, tiled=True)
            return deformable_conv2d(
                full, k, bias_, kernel_size=kernel_size,
                dilation_rate=dilation_rate, skydome=skydome,
                col_start=idx * wl, out_cols=wl,
            )

        mapped = shard_map(
            gather_fn, mesh=mesh,
            in_specs=(P(None, None, "width", None), P(), P()),
            out_specs=P(None, None, "width", None),
        )
        return mapped(x, kernel, bias)

    def halo_fn(xl, k, bias_):
        wl = xl.shape[2]
        from_left, from_right = _exchange_halos(xl, halo, axis)
        xe = jnp.concatenate([from_left, xl, from_right], axis=2)
        xe = jnp.pad(xe, ((0, 0), (t.pad, t.pad), (0, 0), (0, 0)))
        kern = k.reshape(k2, c, f)
        out = jnp.zeros((b, h_out, wl, f), jnp.float32)
        ih = lax.broadcasted_iota(jnp.int32, (h_out, wl), 0)
        jw = lax.broadcasted_iota(jnp.int32, (h_out, wl), 1)
        for tap in range(k2):
            wy = jnp.asarray(t.wy[:, tap])[None, :, None, None]
            wx = jnp.asarray(t.wx[:, tap])[None, :, None, None]
            row0 = jnp.take(xe, jnp.asarray(t.y0[:, tap]), axis=1)
            row1 = jnp.take(xe, jnp.asarray(t.y1[:, tap]), axis=1)
            row_y = (1 - wy) * row0 + wy * row1  # [b, h_out, wl+2*halo, c]
            # Extended coords: local col j samples j + halo + shift; the
            # |shift| <= halo bound makes every index in range — no mod.
            xmat = jw + (halo + signed[:, tap][:, None])
            g0 = row_y[:, ih, xmat, :]
            g1 = row_y[:, ih, xmat + 1, :]
            sample = (1 - wx) * g0 + wx * g1
            out = out + jnp.einsum("bhwc,cf->bhwf", sample, kern[tap],
                                   preferred_element_type=jnp.float32)
        return (out + bias_).astype(xl.dtype)

    mapped = shard_map(
        halo_fn, mesh=mesh,
        in_specs=(P(None, None, "width", None), P(), P()),
        out_specs=P(None, None, "width", None),
    )
    return mapped(x, kernel, bias)
