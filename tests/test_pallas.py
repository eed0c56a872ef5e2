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


def test_pallas_backward_uses_xla_vjp(rng):
    shape, f = (1, 8, 32, 16), 8
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    c = shape[-1]
    k = jnp.asarray((rng.normal(size=(9 * c, f)) * 0.1).astype(np.float32))
    b = jnp.zeros((f,), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(lambda xx: jnp.sum(deformable_conv2d_pallas(xx, k, b) ** 2))(x)
    g2 = jax.grad(lambda xx: jnp.sum(deformable_conv2d(xx, k, b) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-4)
