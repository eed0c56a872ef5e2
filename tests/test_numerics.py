"""Unit tests for HDR compression, CRF interp, DoG, resize, and EMD
(golden vs. SciPy / closed forms, per SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import scipy.stats

from skyhdr.ops import (
    hdr_log_compression,
    hdr_log_decompression,
    apply_rf,
    dog_pyramid,
    gaussian_filter2d,
    resize_bilinear,
    wasserstein_1d,
    compare_luminance,
)


def test_hdr_log_roundtrip(rng):
    x = rng.uniform(0, 1, size=(2, 8, 16, 3)).astype(np.float32)
    y = hdr_log_compression(jnp.asarray(x))
    back = hdr_log_decompression(y)
    np.testing.assert_allclose(np.asarray(back), x, atol=2e-4)
    # Golden values from the closed form (reference tf_utils.py:263-271).
    np.testing.assert_allclose(
        float(hdr_log_compression(jnp.float32(1.0))), 1.0, rtol=1e-6
    )
    np.testing.assert_allclose(
        float(hdr_log_compression(jnp.float32(0.0))), 0.0, atol=1e-7
    )
    np.testing.assert_allclose(
        float(hdr_log_compression(jnp.float32(0.5))),
        np.log1p(5.0) / np.log1p(10.0),
        rtol=1e-6,
    )


def test_apply_rf_against_numpy_interp(rng):
    b, k = 4, 1024
    # Monotone random CRFs from 0 to 1 like DoRF curves.
    curves = np.sort(rng.uniform(0, 1, size=(b, k)).astype(np.float32), axis=-1)
    curves[:, 0], curves[:, -1] = 0.0, 1.0
    x = rng.uniform(0, 1, size=(b, 8, 16, 3)).astype(np.float32)
    got = np.asarray(apply_rf(jnp.asarray(x), jnp.asarray(curves)))
    for i in range(b):
        expected = np.interp(
            (k - 1) * x[i].ravel(), np.arange(k), curves[i]
        ).reshape(x[i].shape)
        np.testing.assert_allclose(got[i], expected, atol=1e-4)


def test_apply_rf_identity_curve(rng):
    k = 256
    curve = np.linspace(0, 1, k, dtype=np.float32)[None].repeat(2, 0)
    x = rng.uniform(0, 1, size=(2, 4, 4, 3)).astype(np.float32)
    got = np.asarray(apply_rf(jnp.asarray(x), jnp.asarray(curve)))
    np.testing.assert_allclose(got, x, atol=1e-5)


def test_gaussian_filter_preserves_mean_and_matches_manual(rng):
    x = rng.uniform(0, 1, size=(1, 8, 8, 1)).astype(np.float32)
    y = np.asarray(gaussian_filter2d(jnp.asarray(x), 3, 1.2489996))
    assert y.shape == x.shape
    # Manual 3x3 gaussian conv with reflect padding at an interior pixel.
    r = np.arange(3) - 1.0
    g = np.exp(-(r**2) / (2 * 1.2489996**2))
    g /= g.sum()
    k2 = np.outer(g, g)
    k2 /= k2.sum()
    manual = (x[0, 2:5, 3:6, 0] * k2).sum()
    np.testing.assert_allclose(y[0, 3, 4, 0], manual, rtol=1e-5)


def test_dog_pyramid_shapes_and_zero_on_constant():
    x = jnp.ones((2, 8, 16, 3), jnp.float32) * 0.37
    bands = dog_pyramid(x)
    assert len(bands) == 4
    for band in bands:
        assert band.shape == (2, 16, 32, 3)
        # Gaussian blurs preserve constants -> DoG of a constant is 0.
        np.testing.assert_allclose(np.asarray(band), 0.0, atol=1e-5)


def test_resize_bilinear_matches_tf_semantics(rng):
    # Half-pixel-center bilinear: compare against a direct gather
    # implementation for an upsample and a downsample.
    x = rng.uniform(0, 1, size=(1, 4, 6, 2)).astype(np.float32)

    def ref_resize(img, H, W):
        h, w = img.shape[1:3]
        out = np.zeros((img.shape[0], H, W, img.shape[3]), np.float32)
        for i in range(H):
            for j in range(W):
                sy = np.clip((i + 0.5) * h / H - 0.5, 0, h - 1)
                sx = np.clip((j + 0.5) * w / W - 0.5, 0, w - 1)
                y0, x0 = int(np.floor(sy)), int(np.floor(sx))
                y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                wy, wx = sy - y0, sx - x0
                out[:, i, j] = (
                    img[:, y0, x0] * (1 - wy) * (1 - wx)
                    + img[:, y0, x1] * (1 - wy) * wx
                    + img[:, y1, x0] * wy * (1 - wx)
                    + img[:, y1, x1] * wy * wx
                )
        return out

    for size in [(8, 12), (2, 3), (4, 6)]:
        got = np.asarray(resize_bilinear(jnp.asarray(x), size))
        np.testing.assert_allclose(got, ref_resize(x, *size), atol=1e-5)


def test_wasserstein_matches_scipy(rng):
    x = rng.uniform(0, 5, size=(3, 100)).astype(np.float32)
    y = rng.uniform(0, 5, size=(3, 100)).astype(np.float32)
    got = np.asarray(wasserstein_1d(jnp.asarray(x), jnp.asarray(y)))
    for i in range(3):
        expected = scipy.stats.wasserstein_distance(x[i], y[i])
        np.testing.assert_allclose(got[i], expected, rtol=1e-4)


def test_compare_luminance_shape(rng):
    a = rng.uniform(0, 1, size=(2, 8, 16, 3)).astype(np.float32)
    b = rng.uniform(0, 1, size=(2, 8, 16, 3)).astype(np.float32)
    out = compare_luminance(jnp.asarray(a), jnp.asarray(b))
    assert out.shape == (2, 1, 1, 1)
    np.testing.assert_array_equal(
        np.asarray(compare_luminance(jnp.asarray(a), jnp.asarray(a))), 0.0
    )
