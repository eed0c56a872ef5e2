"""Difference-of-Gaussian pyramid as static depthwise convolutions.

Reference tf_utils.py:61-73: upsample 2x, blur with a base Gaussian
(sigma=1.2489996, 3x3), then form four DoG bands from paired sigma ladders
(base sigma 1.6, k=2^(1/3)). The reference leans on
tfa.image.gaussian_filter2d per band; here every kernel is a baked 3x3
constant and each blur is a depthwise conv with REFLECT padding — XLA fuses
the whole pyramid into a handful of fused convolutions.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp
from jax import lax

from skyhdr.ops.resize import resize_bilinear

# Sigma ladders (reference tf_utils.py:67-68); pairs overlap so that
# dog_i = blur(sigma2_i) - blur(sigma1_i).
BASE_SIGMA = 1.2489996
SIGMAS_1 = (1.2262735, 1.5450078, 1.9465878, 2.452547)
SIGMAS_2 = (1.5450078, 1.9465878, 2.452547, 3.0900156)


@functools.lru_cache(maxsize=None)
def _gaussian_kernel_2d(ksize: int, sigma: float) -> np.ndarray:
    """Normalized 2-D Gaussian, matching tfa.image.gaussian_filter2d's
    truncated-and-normalized construction."""
    r = (ksize - 1) / 2.0
    x = np.arange(ksize, dtype=np.float64) - r
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    g = g / g.sum()
    k = np.outer(g, g)
    return (k / k.sum()).astype(np.float32)


def gaussian_filter2d(img, ksize: int = 3, sigma: float = 1.0, padding: str = "REFLECT"):
    """Depthwise Gaussian blur of [b, h, w, c] with a static kernel."""
    c = img.shape[-1]
    k2d = _gaussian_kernel_2d(ksize, float(sigma))
    # Depthwise kernel layout HWIO with feature_group_count=c.
    kernel = jnp.asarray(k2d)[:, :, None, None] * jnp.ones((1, 1, 1, c), img.dtype)
    pad = ksize // 2
    mode = {"REFLECT": "reflect", "CONSTANT": "constant", "SYMMETRIC": "symmetric"}[padding]
    x = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode=mode)
    return lax.conv_general_dilated(
        x,
        kernel.astype(img.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def dog_pyramid(img, ksize: int = 3):
    """Four DoG bands of a [b, h, w, c] image (reference tf_utils.py:61-73).

    Returns a tuple of four [b, 2h, 2w, c] arrays.
    """
    b, h, w, c = img.shape
    up = resize_bilinear(img, (2 * h, 2 * w))
    base = gaussian_filter2d(up, ksize, BASE_SIGMA, padding="REFLECT")
    bands = []
    for s1, s2 in zip(SIGMAS_1, SIGMAS_2):
        g1 = gaussian_filter2d(base, ksize, s1, padding="REFLECT")
        g2 = gaussian_filter2d(base, ksize, s2, padding="REFLECT")
        bands.append(g2 - g1)
    return tuple(bands)


def dog_l1_loss(pred, target, ksize: int = 3):
    """Sum of mean-|.| over the four DoG bands (reference train.py:316-322)."""
    pb = dog_pyramid(pred, ksize)
    tb = dog_pyramid(target, ksize)
    loss = 0.0
    for p, t in zip(pb, tb):
        loss = loss + jnp.mean(jnp.abs(p - t))
    return loss
