"""Golden tests for sphere geometry / vMF against the reference formulas
(reference tf_utils.py:95-129, train.py:42-52)."""

import numpy as np
import jax.numpy as jnp

from skyhdr.ops import geometry

H, W = 32, 128
PI = np.pi


def _sunpose_init_ref(i, h, w):
    # Direct transcription of the formula at reference tf_utils.py:112-129.
    x = ((i + 1.0) - np.floor(i / w) * w - 1.0) * (360.0 / w) + 360.0 / (w * 2.0)
    y = np.floor(i / w) * (90.0 / h) + 90.0 / (2.0 * h)
    phi = y * (PI / 180.0)
    theta = (x - 180.0) * (PI / 180.0)
    return np.array(
        [np.cos(phi) * np.cos(theta), np.sin(phi), np.cos(phi) * np.sin(theta)]
    )


def _sphere2world_ref(x, y, h, w, skydome=True):
    # Reference tf_utils.py:95-110.
    unit_w = 2 * PI / w
    unit_h = PI / (h * 2 if skydome else h)
    theta = (x - 0.5 * w) * unit_w
    phi = (h - y) * unit_h if skydome else (h * 0.5 - y) * unit_h
    return np.array(
        [np.cos(phi) * np.cos(theta), np.sin(phi), np.cos(phi) * np.sin(theta)]
    )


def test_sunpose_bins_match_reference_formula():
    bins = geometry.sunpose_bins(H, W)
    assert bins.shape == (H * W, 3)
    for i in [0, 1, W - 1, W, 555, H * W - 1]:
        np.testing.assert_allclose(bins[i], _sunpose_init_ref(i, H, W), atol=1e-6)
    # All unit vectors.
    np.testing.assert_allclose(np.linalg.norm(bins, axis=-1), 1.0, atol=1e-5)


def test_sphere2world_matches_reference_formula():
    for (x, y) in [(0.0, 0.0), (63.0, 10.0), (127.0, 31.0), (64.0, 16.0)]:
        got = np.asarray(geometry.sphere2world(x, y, H, W, skydome=True))
        np.testing.assert_allclose(got, _sphere2world_ref(x, y, H, W), atol=1e-6)
    # Non-skydome branch too.
    got = np.asarray(geometry.sphere2world(10.0, 5.0, H, W, skydome=False))
    np.testing.assert_allclose(got, _sphere2world_ref(10.0, 5.0, H, W, False), atol=1e-6)


def test_vmf_pdf_normalized_and_peaked_at_sun():
    az = W * 0.5 - 1  # reference train.py:32: sun rolled to center column
    elev = 16.0
    pdf = np.asarray(geometry.vmf_pdf(az, elev, H, W, kappa=80.0))
    assert pdf.shape == (H * W,)
    np.testing.assert_allclose(pdf.sum(), 1.0, rtol=1e-5)
    assert (pdf >= 0).all()
    # The argmax bin's center should be the closest bin to the sun direction.
    bins = geometry.sunpose_bins(H, W)
    sun_vec = np.asarray(geometry.sphere2world(az, elev, H, W))
    assert pdf.argmax() == (bins @ sun_vec).argmax()


def test_vmf_pdf_matches_unstabilized_reference_math():
    # With a modest kappa the reference's raw exp (train.py:50) doesn't
    # overflow, so both computations must agree exactly.
    bins = geometry.sunpose_bins(H, W)
    sun = np.asarray(geometry.sphere2world(63.0, 20.0, H, W))
    raw = np.exp(5.0 * (bins @ sun))
    expected = raw / raw.sum()
    got = np.asarray(geometry.vmf_pdf(63.0, 20.0, H, W, kappa=5.0))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_vmf_pdf_batched():
    xs = jnp.array([63.0, 10.0])
    ys = jnp.array([16.0, 4.0])
    pdf = np.asarray(geometry.vmf_pdf(xs, ys, H, W))
    assert pdf.shape == (2, H * W)
    np.testing.assert_allclose(pdf.sum(-1), 1.0, rtol=1e-5)
