"""Conditional PatchGAN discriminator on concat(LDR, HDR).

Mirrors reference discriminator.py:29-50: 4 downsampling stages
(64 no-norm, 128/256 BN stride 2, 512 BN stride 1) and a 1-channel 4x4
VALID conv producing patch logits; LSGAN, so no sigmoid
(discriminator.py:49).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from skyhdr.models.layers import Downsampling


class Discriminator(nn.Module):
    @nn.compact
    def __call__(self, ldr, hdr, train: bool = True):
        x = jnp.concatenate([ldr, hdr], axis=-1)
        x = Downsampling(64, 4, strides=2, apply_norm=False, name="d1")(x, train)
        x = Downsampling(128, 4, strides=2, apply_norm=True, name="d2")(x, train)
        x = Downsampling(256, 4, strides=2, apply_norm=True, name="d3")(x, train)
        x = Downsampling(512, 4, strides=1, apply_norm=True, name="d4")(x, train)
        # Keras Conv2D defaults: padding VALID, bias on, normal(0, 0.02)
        # kernels (reference discriminator.py:38-39). For panoramas smaller
        # than 32x128 the 4x4 VALID window would be empty, so fall back to
        # SAME there (reference only ever runs 32x128+).
        padding = "VALID" if min(x.shape[1], x.shape[2]) >= 4 else "SAME"
        x = nn.Conv(
            1,
            (4, 4),
            strides=(1, 1),
            padding=padding,
            kernel_init=nn.initializers.normal(stddev=0.02),
            name="out",
        )(x)
        return x
