"""The fused dog_l1_loss must equal the band-by-band pyramid computation."""

import numpy as np
import jax.numpy as jnp

from skyhdr.ops.dog import dog_l1_loss, dog_pyramid


def test_fused_dog_loss_matches_pyramid(rng):
    pred = rng.uniform(0, 2, size=(3, 16, 32, 3)).astype(np.float32)
    target = rng.uniform(0, 2, size=(3, 16, 32, 3)).astype(np.float32)
    fused = float(dog_l1_loss(jnp.asarray(pred), jnp.asarray(target)))
    pb = dog_pyramid(jnp.asarray(pred))
    tb = dog_pyramid(jnp.asarray(target))
    expected = sum(float(jnp.mean(jnp.abs(p - t))) for p, t in zip(pb, tb))
    np.testing.assert_allclose(fused, expected, rtol=1e-4)
