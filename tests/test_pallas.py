"""Pallas DA-conv kernel vs the XLA reference, in interpreter mode (runs on
the CPU test mesh; the compiled path is exercised on hardware by bench.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from skyhdr.ops.distortion import deformable_conv2d
from skyhdr.ops.pallas.deform_conv import (
    deformable_conv2d_pallas,
    pallas_supported,
)


def test_pallas_supported_gate():
    assert pallas_supported((2, 16, 64, 128))
    assert not pallas_supported((2, 16, 64, 128), stride=2)
    assert not pallas_supported((1, 2048, 2048, 128))  # exceeds VMEM budget
    # dynamic-offset scratch loads cap at one lane tile (Mosaic): wider
    # channels fall back to XLA.
    assert not pallas_supported((2, 16, 64, 256))


@pytest.mark.parametrize("shape,f", [((2, 8, 32, 16), 8),
                                     ((1, 16, 64, 32), 16)])
def test_pallas_matches_xla_interpret(rng, shape, f):
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    c = shape[-1]
    k = jnp.asarray((rng.normal(size=(9 * c, f)) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(f,)).astype(np.float32))

    expected = deformable_conv2d(x, k, b)
    with pltpu.force_tpu_interpret_mode():
        got = deformable_conv2d_pallas(x, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape,f", [((1, 8, 32, 16), 8),
                                     ((2, 16, 64, 32), 16)])
def test_pallas_backward_gradcheck(rng, shape, f):
    """Pallas bwd (scatter_tables dx kernel + rematerializing dK kernel)
    vs the XLA VJP of the gather path, all three cotangents."""
    from skyhdr.ops.pallas.deform_conv import pallas_bwd_supported

    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    c = shape[-1]
    k = jnp.asarray((rng.normal(size=(9 * c, f)) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(f,)).astype(np.float32))
    assert pallas_bwd_supported(shape, shape[:3] + (f,))

    def loss_p(x, k, b):
        return jnp.sum(deformable_conv2d_pallas(x, k, b) ** 2)

    def loss_x(x, k, b):
        return jnp.sum(deformable_conv2d(x, k, b) ** 2)

    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_p, argnums=(0, 1, 2))(x, k, b)
    want = jax.grad(loss_x, argnums=(0, 1, 2))(x, k, b)
    for name, a, e in zip(("dx", "dk", "db"), got, want):
        # dK accumulates over b*h grid steps sequentially; ordering roundoff
        # vs XLA's tree reduction shows up around 1e-3 relative.
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=5e-3, atol=3e-4, err_msg=name)


def test_pallas_backward_fallback_when_unsupported(rng):
    """Shapes over the VMEM budget take the XLA-VJP fallback inside
    _da_bwd and still produce correct grads (narrow image w<8 forces the
    forward XLA path; exercise the bwd gate directly instead)."""
    from skyhdr.ops.pallas import deform_conv as dc

    assert not dc.pallas_bwd_supported((1, 4096, 1024, 64), (1, 4096, 1024, 64))

    shape, f = (1, 8, 32, 16), 8
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    c = shape[-1]
    k = jnp.asarray((rng.normal(size=(9 * c, f)) * 0.1).astype(np.float32))
    b = jnp.zeros((f,), jnp.float32)
    # Force the fallback branch by monkeypatching the gate.
    orig = dc.pallas_bwd_supported
    dc.pallas_bwd_supported = lambda *a, **kw: False
    try:
        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(lambda xx: jnp.sum(
                deformable_conv2d_pallas(xx, k, b) ** 2))(x)
    finally:
        dc.pallas_bwd_supported = orig
    g2 = jax.grad(lambda xx: jnp.sum(deformable_conv2d(xx, k, b) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-4)
