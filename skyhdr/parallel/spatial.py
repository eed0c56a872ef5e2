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
  * ring_deformable_conv2d — the distortion-aware conv; its column shifts
    grow unboundedly toward the zenith, so the input rides one all-gather
    over the width axis while each device computes only its own output
    columns (compute still splits W-ways; the gather is the bandwidth price
    of pole-sized halos).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from skyhdr.ops.distortion import deformable_conv2d


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


def ring_deformable_conv2d(x, kernel, bias, *, mesh: Mesh,
                           kernel_size: int = 3, dilation_rate: int = 1,
                           skydome: bool = True):
    """Width-sharded distortion-aware conv: all-gather the width axis, run
    the structured-gather conv on the local output columns only.

    x: [b, h, W, c] sharded over `width`; kernel [k^2*c, f].
    """
    b, h, w, c = x.shape
    axis = "width"

    def local_fn(xl, k, bias_):
        idx = lax.axis_index(axis)
        w_local = xl.shape[2]
        # Full panorama on every device (tiled=True keeps the width layout),
        # but each device computes ONLY its own output columns — the matmul
        # FLOPs split W-ways.
        full = lax.all_gather(xl, axis, axis=2, tiled=True)
        return deformable_conv2d(
            full, k, bias_, kernel_size=kernel_size,
            dilation_rate=dilation_rate, skydome=skydome,
            col_start=idx * w_local, out_cols=w_local,
        )

    mapped = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, None, "width", None), P(), P()),
        out_specs=P(None, None, "width", None),
    )
    return mapped(x, kernel, bias)
