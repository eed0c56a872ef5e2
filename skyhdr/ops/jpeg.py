"""On-device JPEG compression simulation.

The reference degrades each sample with a real encode/decode round-trip via
`tf.image.adjust_jpeg_quality` inside a `tf.py_function` (train.py:84-92),
which serializes the whole input pipeline on the host — SURVEY.md §3.1 flags
it as a hot-loop bottleneck. Here the JPEG artifact model (blockwise DCT
quantization in YCbCr with optional 4:2:0 chroma subsampling) runs entirely
on device as static-shape matmuls, so the whole degradation pipeline lives
inside the jitted train step. The 8x8 DCT is two 8x8 matmuls per block —
pure MXU food.

Quality->quantization-table scaling follows the IJG (libjpeg) formula that
`adjust_jpeg_quality` ultimately uses. Per-sample quality is supported as a
batched quant table, matching the reference's quality ramp
round(i/(b-1)*10+90) (train.py:89).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

# ITU-T T.81 Annex K baseline tables.
_Q_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], np.float32)

_Q_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], np.float32)


@functools.lru_cache(maxsize=None)
def _dct8() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix."""
    k = np.arange(8)
    n = np.arange(8)
    m = np.cos(np.pi * (2 * n[None, :] + 1) * k[:, None] / 16.0)
    m[0] *= 1.0 / np.sqrt(2.0)
    return (m * 0.5).astype(np.float32)


def quant_table(quality, base: np.ndarray):
    """IJG quality scaling -> integer quant table, batched over quality.

    quality: [...] float/int in [1, 100]. Returns [..., 8, 8] float.
    """
    q = jnp.clip(jnp.asarray(quality, jnp.float32), 1.0, 100.0)
    scale = jnp.where(q < 50.0, 5000.0 / q, 200.0 - 2.0 * q)
    t = jnp.floor((jnp.asarray(base) * scale[..., None, None] + 50.0) / 100.0)
    return jnp.clip(t, 1.0, 255.0)


def _rgb_to_ycbcr(rgb):
    """JFIF full-range BT.601. rgb in [0, 255]."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _ycbcr_to_rgb(y, cb, cr):
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return jnp.stack([r, g, b], axis=-1)


def _blockify(x):
    """[b, h, w] -> [b, h//8, w//8, 8, 8]."""
    b, h, w = x.shape
    return x.reshape(b, h // 8, 8, w // 8, 8).transpose(0, 1, 3, 2, 4)


def _unblockify(x, h, w):
    b = x.shape[0]
    return x.transpose(0, 1, 3, 2, 4).reshape(b, h, w)


def _quantize_plane(plane, qtab):
    """DCT -> quantize -> dequantize -> IDCT for one [b, h, w] plane with a
    per-sample [b, 8, 8] quant table."""
    b, h, w = plane.shape
    d = jnp.asarray(_dct8())
    blocks = _blockify(plane - 128.0)
    coef = jnp.einsum("ij,bmnjk,lk->bmnil", d, blocks, d,
                      preferred_element_type=jnp.float32)
    q = qtab[:, None, None, :, :]
    coef = jnp.round(coef / q) * q
    rec = jnp.einsum("ji,bmnjk,kl->bmnil", d, coef, d,
                     preferred_element_type=jnp.float32)
    return _unblockify(rec, h, w) + 128.0


def jpeg_simulate(img01, quality, chroma_subsample: bool = True):
    """Simulate a JPEG encode/decode round-trip on device.

    img01:   [b, h, w, 3] in [0, 1] (h, w multiples of 8; 16 if subsampling)
    quality: [b] per-sample quality in [1, 100]
    Returns [b, h, w, 3] in [0, 1].
    """
    b, h, w, _ = img01.shape
    x = jnp.clip(img01, 0.0, 1.0) * 255.0
    # Quantize to 8-bit first (the reference rounds before encoding,
    # train.py:84-85).
    x = jnp.round(x)
    y, cb, cr = _rgb_to_ycbcr(x)

    qy = quant_table(quality, _Q_LUMA)
    qc = quant_table(quality, _Q_CHROMA)

    y = _quantize_plane(y, qy)

    if chroma_subsample:
        # 4:2:0 — average 2x2, quantize at half resolution, upsample.
        def down(p):
            return p.reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4))

        def up(p):
            return jnp.repeat(jnp.repeat(p, 2, axis=1), 2, axis=2)

        cb = up(_quantize_plane(down(cb), qc))
        cr = up(_quantize_plane(down(cr), qc))
    else:
        cb = _quantize_plane(cb, qc)
        cr = _quantize_plane(cr, qc)

    rgb = _ycbcr_to_rgb(y, cb, cr)
    rgb = jnp.clip(jnp.round(rgb), 0.0, 255.0)
    return rgb / 255.0
