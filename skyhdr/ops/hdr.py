"""HDR mu-law log compression and colorspace helpers.

  * hdr_log_compression / hdr_log_decompression — reference tf_utils.py:263-280
  * rgb2gray (BT.2020 luma weights)             — reference tf_utils.py:75-78
  * rgb2bgr / bgr2rgb                           — reference tf_utils.py:85-93

The new framework normalizes on RGB everywhere (the reference's BGR juggling
at train.py:386-387 / vgg16.py:133-141 is an OpenCV ingestion artifact); the
channel-flip helpers exist for I/O boundaries and parity tests only.
"""

from __future__ import annotations

import jax.numpy as jnp


def hdr_log_compression(x, valid_dr: float = 10.0):
    """mu-law-style log compression, [0, inf) -> [0, ~1] for x in [0, 1].

    y = log(1 + valid_dr * x) / log(1 + valid_dr)   (reference tf_utils.py:263)
    """
    return jnp.log1p(valid_dr * x) / jnp.log1p(valid_dr)


def hdr_log_decompression(x, valid_dr: float = 10.0):
    """Inverse of hdr_log_compression (reference tf_utils.py:273)."""
    return jnp.expm1(x * jnp.log1p(valid_dr)) / valid_dr


def rgb2gray(rgb):
    """BT.2020 luma from an RGB image [..., 3] (reference tf_utils.py:75)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return (0.2627 * r + 0.6780 * g + 0.0593 * b)[..., None]


def rgb2bgr(rgb):
    """Channel flip (reference tf_utils.py:85)."""
    return rgb[..., ::-1]


def bgr2rgb(bgr):
    """Channel flip (reference tf_utils.py:90)."""
    return bgr[..., ::-1]
