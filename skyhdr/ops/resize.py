"""Bilinear resize as two static interpolation matmuls.

TPU-first replacement for tf.image.resize(..., BILINEAR) (used by the
reference's resize-deconv ops.py:121-124, Grad-CAM upsampling
generator.py:161-162, and the DoG pyramid tf_utils.py:64). Instead of a
gather, the separable bilinear kernel is baked into two small static
matrices applied with einsum — both land on the MXU and fuse with the
surrounding convs.

Semantics match TF2's default (half_pixel_centers=True, antialias=False):
source coordinate = (dst + 0.5) * (in/out) - 0.5, clamped to the edge.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] bilinear interpolation matrix with half-pixel centers."""
    if n_in == n_out:
        return np.eye(n_in, dtype=np.float32)
    scale = n_in / n_out
    src = (np.arange(n_out, dtype=np.float64) + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, n_in - 1)
    i0 = np.floor(src).astype(np.int64)
    i1 = np.minimum(i0 + 1, n_in - 1)
    w1 = src - i0
    w0 = 1.0 - w1
    m = np.zeros((n_out, n_in), dtype=np.float64)
    m[np.arange(n_out), i0] += w0
    m[np.arange(n_out), i1] += w1
    return m.astype(np.float32)


def _upsample_axis_int(img, axis: int, s: int):
    """Integer-factor half-pixel bilinear upsample along `axis` as a fixed
    per-phase 2-tap blend + interleave — pure elementwise ops, which forward
    AND reverse-differentiate far better on TPU than the matmul form (the
    einsum's transpose in the backward pass dominated decoder gradients)."""
    n = img.shape[axis]

    def take(idx):
        idx = np.clip(idx, 0, n - 1)
        return jnp.take(img, jnp.asarray(idx), axis=axis)

    base = np.arange(n)
    phases = []
    for r in range(s):
        frac = (r + 0.5) / s - 0.5  # offset of the source sample
        if frac < 0:
            lo, hi, t = base - 1, base, 1.0 + frac
        else:
            lo, hi, t = base, base + 1, frac
        phases.append((1.0 - t) * take(lo) + t * take(hi))
    out = jnp.stack(phases, axis=axis + 1 if axis >= 0 else img.ndim + axis + 1)
    new_shape = list(img.shape)
    new_shape[axis] = n * s
    return out.reshape(new_shape)


def resize_bilinear(img, size):
    """Resize [..., h, w, c] -> [..., H, W, c] with bilinear interpolation."""
    H, W = int(size[0]), int(size[1])
    h, w = img.shape[-3], img.shape[-2]
    if (h, w) == (H, W):
        return img
    # Fast path: integer upscaling (2x decoder stages, 2x/4x CAM and DoG
    # upsampling) via phase interleave.
    out = img
    if H % h == 0 and W % w == 0 and H // h >= 1 and W // w >= 1 and (H > h or W > w):
        if H > h:
            out = _upsample_axis_int(out, out.ndim - 3, H // h)
        if W > w:
            out = _upsample_axis_int(out, out.ndim - 2, W // w)
        return out
    mh = jnp.asarray(_interp_matrix(h, H))
    mw = jnp.asarray(_interp_matrix(w, W))
    out = jnp.einsum("Hh,...hwc->...Hwc", mh, img)
    out = jnp.einsum("Ww,...hwc->...hWc", mw, out)
    return out
