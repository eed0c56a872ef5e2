"""Tests for the distortion-aware equirectangular conv: golden offset table
vs. a direct transcription of the reference loop
(distortion_aware_ops.py:198-270), plus execution invariants."""

import numpy as np
import jax
import jax.numpy as jnp

from skyhdr.ops.distortion import (
    DAConv,
    deformable_conv2d,
    distortion_offsets,
    gather_tables,
)

PI = np.pi


def _distortion_ref(h, w, kernel_size=3, dilation_rate=1, skydome=True):
    """Direct NumPy transcription of reference distortion_aware_ops.py
    make_grid (186-196) + distortion (198-270)."""
    k = kernel_size
    middle = (k // 2) * (k + 1)
    unit_w = 2 * PI / w
    unit_h = PI / (h * 2 if skydome else h)
    rho = np.tan(unit_w) * dilation_rate
    v = np.array([0.0, 1.0, 0.0])

    r = k // 2
    r_grid = []
    for gy in range(r, -r - 1, -1):
        for gx in range(r, -r - 1, -1):
            r_grid.append([gx, gy])

    x = int(w * 0.5)
    res = []
    for y in range(h):
        theta = (x - 0.5 * w) * unit_w
        phi = (h - y) * unit_h if skydome else (h * 0.5 - y) * unit_h
        p_u = np.array([np.cos(phi) * np.cos(theta), np.sin(phi),
                        np.cos(phi) * np.sin(theta)])
        t_x = np.cross(v, p_u)
        t_y = np.cross(p_u, t_x)
        k_pts = []
        for g in r_grid:
            p_ur = p_u + rho * (g[0] * t_x + g[1] * t_y)
            ux, uy, uz = p_ur
            if ux > 0:
                theta_r = np.arctan2(uz, ux)
            elif ux < 0:
                theta_r = np.arctan2(uz, ux) + (PI if uz >= 0 else -PI)
            else:
                theta_r = PI * 0.5 if uz > 0 else -PI * 0.5
            phi_r = np.arcsin(np.clip(uy, -1, 1))
            x_r = (theta_r / PI + 1) * 0.5 * w
            y_r = (1.0 - 2 * phi_r / PI) * h if skydome else (0.5 - phi_r / PI) * h
            k_pts.append([y_r, x_r])
        k_pts = np.array(k_pts)
        res.append(k_pts - k_pts[middle])
    return np.stack(res)  # [h, k2, 2]


def test_offsets_match_reference_loop():
    for (h, w) in [(32, 128), (8, 32)]:
        got = distortion_offsets(h, w, 3, 1)
        ref = _distortion_ref(h, w, 3, 1)
        np.testing.assert_allclose(got, ref, atol=1e-4)
    # Dilation scales the tangent displacement.
    got = distortion_offsets(8, 32, 3, 2)
    ref = _distortion_ref(8, 32, 3, 2)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_offsets_center_tap_zero_and_row_monotonic():
    off = distortion_offsets(32, 128, 3, 1)
    # Middle tap offset is identically zero.
    np.testing.assert_allclose(off[:, 4, :], 0.0, atol=1e-6)
    # Distortion grows toward the zenith (top rows): x-offsets of corner
    # taps are larger in magnitude at row 1 than at the horizon row.
    assert abs(off[1, 0, 1]) > abs(off[31, 0, 1])


def test_k1_daconv_equals_pointwise_conv(rng):
    """With a 1x1 kernel the offset table is exactly zero, so the DA conv
    must reduce to a plain pointwise conv."""
    x = rng.normal(size=(2, 8, 32, 4)).astype(np.float32)
    kernel = rng.normal(size=(4, 6)).astype(np.float32)
    bias = rng.normal(size=(6,)).astype(np.float32)
    got = np.asarray(
        deformable_conv2d(jnp.asarray(x), jnp.asarray(kernel), jnp.asarray(bias),
                          kernel_size=1)
    )
    expected = x @ kernel + bias
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_deformable_conv_matches_bruteforce_gather(rng):
    """Cross-check the structured row-gather + column-roll execution against
    a naive per-pixel bilinear gather using the same tables."""
    h, w, c, f = 8, 16, 3, 5
    x = rng.normal(size=(1, h, w, c)).astype(np.float32)
    kernel = rng.normal(size=(9 * c, f)).astype(np.float32) * 0.1
    bias = np.zeros((f,), np.float32)

    got = np.asarray(
        deformable_conv2d(jnp.asarray(x), jnp.asarray(kernel), jnp.asarray(bias))
    )

    t = gather_tables(h, w, 3, 1, 1, True)
    xp = np.pad(x, ((0, 0), (t.pad, t.pad), (0, 0), (0, 0)))
    expected = np.zeros((1, h, w, f), np.float32)
    kern = kernel.reshape(9, c, f)
    for i in range(h):
        for j in range(w):
            for tap in range(9):
                y0, y1 = t.y0[i, tap], t.y1[i, tap]
                x0 = (j + t.cx0[i, tap]) % w
                x1 = (j + t.cx1[i, tap]) % w
                wy, wx = t.wy[i, tap], t.wx[i, tap]
                s = ((1 - wy) * (1 - wx) * xp[0, y0, x0]
                     + (1 - wy) * wx * xp[0, y0, x1]
                     + wy * (1 - wx) * xp[0, y1, x0]
                     + wy * wx * xp[0, y1, x1])
                expected[0, i, j] += s @ kern[tap]
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_daconv_module_shapes_and_grads(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 32, 3)).astype(np.float32))
    layer = DAConv(16, kernel_size=3)
    params = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(params, x)
    assert y.shape == (2, 8, 32, 16)

    def loss(p):
        return jnp.sum(layer.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    gk = g["params"]["kernel"]
    assert bool(jnp.all(jnp.isfinite(gk)))
    assert float(jnp.abs(gk).max()) > 0


def test_daconv_wraparound_is_cyclic(rng):
    """True 360-degree semantics: rolling the input panorama by any column
    shift must roll the output identically (cyclic equivariance in width)."""
    x = rng.normal(size=(1, 8, 32, 3)).astype(np.float32)
    kernel = rng.normal(size=(27, 4)).astype(np.float32)
    bias = np.zeros((4,), np.float32)
    y = np.asarray(deformable_conv2d(jnp.asarray(x), jnp.asarray(kernel), jnp.asarray(bias)))
    for shift in [1, 7, 16]:
        xr = np.roll(x, shift, axis=2)
        yr = np.asarray(
            deformable_conv2d(jnp.asarray(xr), jnp.asarray(kernel), jnp.asarray(bias))
        )
        np.testing.assert_allclose(yr, np.roll(y, shift, axis=2), rtol=1e-4, atol=1e-5)
