"""Loss functions with the reference's exact semantics.

  * kl_divergence    — tf.keras.losses.KLDivergence (train.py:232,305):
                       clip both to [1e-7, 1], sum over bins, mean over batch
  * LSGAN losses     — train.py:235-237,369
  * dog_l1_loss      — skyhdr.ops.dog (train.py:316-322)
  * perceptual_l1    — skyhdr.models.vgg16 (train.py:308-313)
  * total generator loss weights — train.py:331
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-7


def kl_divergence(y_true, y_pred):
    """Keras-semantics KL: mean_b sum_bins gt*log(gt/pred)."""
    t = jnp.clip(y_true, _EPS, 1.0)
    p = jnp.clip(y_pred, _EPS, 1.0)
    return jnp.mean(jnp.sum(t * jnp.log(t / p), axis=-1))


def lsgan_gen_loss(disc_generated):
    """mean((D(G) - 1)^2) (train.py:235)."""
    return jnp.mean(jnp.square(disc_generated - 1.0))


def lsgan_disc_loss(disc_real, disc_generated):
    """0.5 * (mean((D(real)-1)^2) + mean(D(G)^2)) (train.py:236-237,369)."""
    real = jnp.mean(jnp.square(disc_real - 1.0))
    generated = jnp.mean(jnp.square(disc_generated))
    return 0.5 * (real + generated), real, generated


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))
