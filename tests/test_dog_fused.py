"""The matmul dog_l1_loss must equal both the depthwise-conv fused form and
the band-by-band pyramid computation (values AND gradients) — it relies on
DoG linearity (dog(p) - dog(t) = dog(p - t)) and on composed per-axis
operator matrices whose boundary handling must match the conv pipeline's
clamp upsample + REFLECT pads exactly."""

import jax
import numpy as np
import jax.numpy as jnp

from skyhdr.ops.dog import dog_l1_loss, dog_l1_loss_conv, dog_pyramid


def test_fused_dog_loss_matches_pyramid(rng):
    pred = rng.uniform(0, 2, size=(3, 16, 32, 3)).astype(np.float32)
    target = rng.uniform(0, 2, size=(3, 16, 32, 3)).astype(np.float32)
    fused = float(dog_l1_loss(jnp.asarray(pred), jnp.asarray(target)))
    pb = dog_pyramid(jnp.asarray(pred))
    tb = dog_pyramid(jnp.asarray(target))
    expected = sum(float(jnp.mean(jnp.abs(p - t))) for p, t in zip(pb, tb))
    np.testing.assert_allclose(fused, expected, rtol=1e-4)


def test_matmul_dog_matches_conv_values_and_grads(rng):
    for shape in [(4, 32, 128, 3), (2, 16, 64, 1)]:
        pred = jnp.asarray(rng.uniform(0, 2, size=shape).astype(np.float32))
        target = jnp.asarray(rng.uniform(0, 2, size=shape).astype(np.float32))
        l_mm = float(dog_l1_loss(pred, target))
        l_cv = float(dog_l1_loss_conv(pred, target))
        np.testing.assert_allclose(l_mm, l_cv, rtol=1e-5, atol=1e-8)
        g_mm = jax.grad(lambda p: dog_l1_loss(p, target))(pred)
        g_cv = jax.grad(lambda p: dog_l1_loss_conv(p, target))(pred)
        np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_cv),
                                   rtol=1e-4, atol=1e-7)
