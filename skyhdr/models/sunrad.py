"""Sun-radiance head: CNN over (LDR ++ CAMs) -> scalars (gamma, beta) ->
analytic Dirac-delta radiance applied to the normalized sun-pose PDF.

Mirrors reference sunrad_net.py:30-70. The radiance path stays float32 —
values reach the 3e4 clip (sunrad_net.py:69), beyond bf16's comfortable
integer range.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from skyhdr.models.layers import Downsampling


class SunRadNet(nn.Module):
    epsilon: float = 1e-5
    clip_value: float = 30000.0
    dtype: any = None

    @nn.compact
    def __call__(self, x, actv_map, train: bool = True):
        """x: normalized sun-pose PDF [b, h, w, 1]; actv_map: concat of LDR
        and CAMs [b, h, w, 6]. Returns (radiance [b,h,w,1], gamma, beta)."""
        dt = self.dtype
        d = Downsampling(64, 4, strides=2, apply_norm=False, dtype=dt, name="d1")(actv_map, train)
        d = Downsampling(128, 4, strides=2, apply_norm=True, dtype=dt, name="d2")(d, train)
        d = Downsampling(256, 4, strides=2, apply_norm=True, dtype=dt, name="d3")(d, train)
        d = Downsampling(512, 4, strides=1, apply_norm=True, dtype=dt, name="d4")(d, train)
        d = d.astype(jnp.float32)

        flat = d.reshape((d.shape[0], -1))
        gamma = nn.Dense(1, name="gamma")(flat)
        beta = nn.Dense(1, name="beta")(flat)

        gamma_in = nn.sigmoid(gamma).reshape((-1, 1, 1, 1)).astype(jnp.float32)
        beta_in = nn.sigmoid(beta).reshape((-1, 1, 1, 1)).astype(jnp.float32)

        # Dirac-delta radiance: gamma * exp(-(1-x)^2 / beta) / (beta*sqrt(pi))
        # clipped at clip_value (reference sunrad_net.py:62-69).
        x = x.astype(jnp.float32)
        rad = -jnp.square(1.0 - x)
        rad = rad / (beta_in + self.epsilon)
        rad = jnp.exp(rad) * gamma_in
        rad = rad / (beta_in * np.sqrt(np.pi) + self.epsilon)
        rad = jnp.where(rad > self.clip_value, self.clip_value, rad)
        return rad, gamma_in, beta_in
