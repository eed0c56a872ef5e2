"""Sky-dome sphere geometry and the von Mises-Fisher sun-pose ground truth.

TPU-first redesign of the reference's per-bin Python loops:
  * sphere2world           — reference tf_utils.py:95-110
  * sunpose_bins           — reference tf_utils.py:112-129 (sunpose_init),
                             built bin-by-bin in a Python list comprehension
                             at reference train.py:40; here one vectorized
                             closed-form table.
  * vmf_pdf                — reference train.py:42-52 (vMF), one matmul.

Coordinate conventions (unchanged from the reference): the panorama is an
equirectangular sky dome, elevation 0-90 deg top-down over `h` rows, azimuth
0-360 deg over `w` columns; unit vectors are (cos(phi)cos(theta), sin(phi),
cos(phi)sin(theta)).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

PI = np.pi


def sphere2world(x, y, h: int, w: int, skydome: bool = True):
    """Pixel coordinate (x, y) -> unit world vector [3].

    Mirrors reference tf_utils.py:95-110. Accepts scalars or arrays
    (broadcasting); works under jit.
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    unit_w = 2.0 * PI / w
    unit_h = PI / (h * 2 if skydome else h)

    theta = (x - 0.5 * w) * unit_w
    phi = (h - y) * unit_h if skydome else (h * 0.5 - y) * unit_h

    x_u = jnp.cos(phi) * jnp.cos(theta)
    y_u = jnp.sin(phi)
    z_u = jnp.cos(phi) * jnp.sin(theta)
    return jnp.stack([x_u, y_u, z_u], axis=-1)


def sunpose_bins(h: int, w: int) -> np.ndarray:
    """[h*w, 3] table of bin-center unit vectors.

    Vectorized equivalent of `[sunpose_init(i, h, w) for i in range(h*w)]`
    (reference train.py:40, tf_utils.py:112-129). Returns NumPy so it can be
    baked into jitted graphs as a constant.
    """
    i = np.arange(h * w, dtype=np.float32)
    # Bin center in degrees: (i mod w) columns, floor(i/w) rows, plus half a
    # bin (reference tf_utils.py:116-117).
    x = ((i + 1.0) - np.floor(i / w) * w - 1.0) * (360.0 / w) + 360.0 / (2.0 * w)
    y = np.floor(i / w) * (90.0 / h) + 90.0 / (2.0 * h)

    phi = y * (PI / 180.0)
    theta = (x - 180.0) * (PI / 180.0)

    x_u = np.cos(phi) * np.cos(theta)
    y_u = np.sin(phi)
    z_u = np.cos(phi) * np.sin(theta)
    return np.stack([x_u, y_u, z_u], axis=-1).astype(np.float32)


def positional_encoding(x, with_r: bool = False):
    """Coord-conv positional channels (reference tf_utils.py:131-150 —
    defined there but uncalled; kept as a usable op): append normalized
    (x, y[, r]) grids to [b, h, w, c]."""
    b, h, w, _ = x.shape
    wr = jnp.linspace(-1.0, 1.0, w)
    hr = jnp.linspace(-1.0, 1.0, h)
    gx, gy = jnp.meshgrid(wr, hr)
    coords = [gx[None, :, :, None], gy[None, :, :, None]]
    if with_r:
        r = jnp.sqrt(jnp.square(gx - w * 0.5) + jnp.square(gy - h * 0.5))
        coords.append(r[None, :, :, None])
    grid = jnp.concatenate(coords, axis=-1)
    grid = jnp.broadcast_to(grid, (b, h, w, grid.shape[-1])).astype(x.dtype)
    return jnp.concatenate([x, grid], axis=-1)


def vmf_pdf(x, y, h: int, w: int, kappa: float = 80.0, bins=None):
    """Discrete von Mises-Fisher PDF over the h*w sky bins for a sun at
    pixel (x, y). Mirrors reference train.py:42-52; the per-bin dot products
    collapse to a single [h*w, 3] @ [3] product.

    `bins` may be passed to reuse a precomputed `sunpose_bins(h, w)` table.
    Supports batched (x, y) via broadcasting: returns [..., h*w].
    """
    if bins is None:
        bins = sunpose_bins(h, w)
    bins = jnp.asarray(bins)
    sp_vec = sphere2world(x, y, h, w, skydome=True)  # [..., 3]
    dots = jnp.einsum("nc,...c->...n", bins, sp_vec)
    # Subtract the max before exp for numerical stability; the reference
    # (train.py:50) exponentiates raw kappa*dot which overflows for large
    # kappa — the normalized PDF is identical.
    dots = kappa * dots
    dots = dots - jnp.max(dots, axis=-1, keepdims=True)
    pdf = jnp.exp(dots)
    return pdf / jnp.sum(pdf, axis=-1, keepdims=True)
