"""Tests for auxiliary parity ops (coord-conv encoding, op-library extras)
and the profiling utilities."""

import numpy as np
import jax
import jax.numpy as jnp

from skyhdr.models.layers import BatchNorm, DFC2D, FC2D, avgpool2
from skyhdr.ops.geometry import positional_encoding
from skyhdr.train.profiling import StepTimer


def test_positional_encoding_shapes(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 3)).astype(np.float32))
    y = positional_encoding(x)
    assert y.shape == (2, 8, 16, 5)
    np.testing.assert_allclose(np.asarray(y[..., :3]), np.asarray(x))
    # x-channel ranges -1..1 across width.
    np.testing.assert_allclose(float(y[0, 0, 0, 3]), -1.0, atol=1e-6)
    np.testing.assert_allclose(float(y[0, 0, -1, 3]), 1.0, atol=1e-6)
    yr = positional_encoding(x, with_r=True)
    assert yr.shape == (2, 8, 16, 6)


def test_fc_layers(rng):
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 3)).astype(np.float32))
    fc = FC2D(16)
    p = fc.init(jax.random.PRNGKey(0), x)
    y = fc.apply(p, x)
    assert y.shape == (2, 1, 1, 16)

    dfc = DFC2D(4, 8, 3)
    p2 = dfc.init(jax.random.PRNGKey(0), y)
    z = dfc.apply(p2, y)
    assert z.shape == (2, 4, 8, 3)

    assert avgpool2(x).shape == (2, 2, 4, 3)

    bn = BatchNorm()
    pb = bn.init(jax.random.PRNGKey(0), x, train=False)
    out, mut = bn.apply(pb, x, train=True, mutable=["batch_stats"])
    assert out.shape == x.shape and "batch_stats" in mut


def test_step_timer():
    t = StepTimer()
    for _ in range(5):
        t.start()
        t.stop()
    s = t.stats()
    assert s["steps"] == 5 and s["mean_ms"] >= 0
    t.reset()
    assert t.stats() == {}
