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


@functools.lru_cache(maxsize=None)
def _gaussian_1d(ksize: int, sigma: float) -> np.ndarray:
    """Normalized 1-D factor of _gaussian_kernel_2d (it is separable:
    outer(g, g) with g normalized)."""
    r = (ksize - 1) / 2.0
    x = np.arange(ksize, dtype=np.float64) - r
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float64)


@functools.lru_cache(maxsize=None)
def _dog_axis_operators(n: int, ksize: int):
    """Per-axis [2n x n] base operator and [8, 2n x 2n] band-blur operators.

    Every step of the DoG pipeline is LINEAR along each axis, so the whole
    upsample(clamp) -> reflect-pad -> base blur chain composes into one
    dense matrix per axis (A0 = B_base @ U), and each band blur with its
    reflect pad into another (S_j = D_j @ R). Boundary handling is exact by
    construction — the matrices are built from the actual pad/blur
    operators. Applied with einsum these run on the MXU with full 128-lane
    occupancy, unlike the depthwise c=1..3 convs they replace (BASELINE.md:
    every DoG blur had 3/128 lane occupancy)."""
    from skyhdr.ops.resize import _interp_matrix

    m = 2 * n
    pad = ksize // 2
    # Reflect-pad selection matrix [m + 2*pad, m].
    idx = np.pad(np.arange(m), (pad, pad), mode="reflect")
    R = np.zeros((m + 2 * pad, m), np.float64)
    R[np.arange(m + 2 * pad), idx] = 1.0

    def blur_mat(sigma):
        g = _gaussian_1d(ksize, float(sigma))
        D = np.zeros((m, m + 2 * pad), np.float64)
        for t in range(ksize):
            D[np.arange(m), np.arange(m) + t] += g[t]
        return D @ R

    U = _interp_matrix(n, m).astype(np.float64)  # 2x clamp upsample
    A0 = (blur_mat(BASE_SIGMA) @ U).astype(np.float32)
    S = np.stack([blur_mat(s) for s in SIGMAS_1 + SIGMAS_2]).astype(np.float32)
    return A0, S


def dog_l1_loss(pred, target, ksize: int = 3):
    """Sum of mean-|.| over the four DoG bands (reference train.py:316-322).

    Two TPU-first transforms of the reference's 18-blur pipeline:
      1. DoG is linear, so dog(pred) - dog(target) = dog(pred - target) —
         one pyramid instead of two.
      2. The upsample/reflect-pad/blur chain is per-axis linear and becomes
         four stacked einsums against static band matrices
         (_dog_axis_operators) — full MXU lane occupancy instead of
         3-channel depthwise convs at 3/128 lanes. Measured: the conv form
         cost 4.25 ms fwd / 5.6 ms fwd+bwd of a ~21 ms train step at
         32x128 b32.
    Boundary semantics (clamp upsample, REFLECT blur pads) are baked into
    the matrices exactly; equality with the conv pipeline is tested to
    roundoff (tests/test_dog_fused.py).
    """
    d = pred - target  # linearity: one pyramid on the difference
    h, w = d.shape[1], d.shape[2]
    A0h, Sh = _dog_axis_operators(h, ksize)
    A0w, Sw = _dog_axis_operators(w, ksize)
    y = jnp.einsum("Hh,bhwc->bHwc", jnp.asarray(A0h), d)
    y = jnp.einsum("Ww,bHwc->bHWc", jnp.asarray(A0w), y)
    z = jnp.einsum("jKH,bHWc->bjKWc", jnp.asarray(Sh), y)
    z = jnp.einsum("jLW,bjKWc->bjKLc", jnp.asarray(Sw), z)
    dog = z[:, 4:] - z[:, :4]
    # Sum over bands of the per-band mean == 4 * mean over everything.
    return 4.0 * jnp.mean(jnp.abs(dog))


def dog_l1_loss_conv(pred, target, ksize: int = 3):
    """Depthwise-conv DoG loss (the pre-2026-08-18 path): kept as the
    parity cross-check for the matmul form and for any backend where the
    einsum path underperforms.

    Fused execution: pred and target are batched together and all eight band
    blurs collapse into ONE depthwise conv with a channel multiplier (the
    per-band 3x3 kernels are static), so the whole loss is
    resize + base blur + one 8-band conv instead of 18 separate blurs.
    """
    b = pred.shape[0]
    both = jnp.concatenate([pred, target], axis=0)
    h, w, c = both.shape[1], both.shape[2], both.shape[3]
    up = resize_bilinear(both, (2 * h, 2 * w))
    base = gaussian_filter2d(up, ksize, BASE_SIGMA, padding="REFLECT")

    # One depthwise conv, channel multiplier 8 (4 sigma1 + 4 sigma2 bands).
    # With feature_group_count=c the output-channel axis is laid out as
    # [c groups x 8 bands]: out[..., ci*8 + j] = blur_j(x[..., ci]).
    kernels = [_gaussian_kernel_2d(ksize, float(s)) for s in SIGMAS_1 + SIGMAS_2]
    kb = np.stack(kernels, axis=-1)  # [k, k, 8]
    kern = np.zeros((ksize, ksize, 1, c * 8), np.float32)
    for ci in range(c):
        kern[:, :, 0, ci * 8:(ci + 1) * 8] = kb
    kern = jnp.asarray(kern, base.dtype)

    pad = ksize // 2
    xpad = jnp.pad(base, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                   mode="reflect")
    blurred = lax.conv_general_dilated(
        xpad, kern, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )  # [2b, 2h, 2w, c*8]
    blurred = blurred.reshape(2 * b, 2 * h, 2 * w, c, 8)
    dog = blurred[..., 4:] - blurred[..., :4]  # [2b, ., ., c, 4]
    diff = jnp.abs(dog[:b] - dog[b:])
    # Sum over bands of the per-band mean == 4 * mean over everything.
    return jnp.sum(jnp.mean(diff, axis=(0, 1, 2, 3)))
