"""Camera-response-function application as a vectorized gather-interp.

The reference applies a per-sample CRF curve via nested gather helpers
(tf_utils.py:191-255: sample_1d / interp_1d / apply_rf). Here it is one
take_along_axis + lerp, fully shape-static and fused by XLA into the
surrounding degradation pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp


def interp1d_batched(curves, pos):
    """Linear interpolation into per-batch 1-D curves.

    curves: [b, k]   (monotone CRF samples over [0, 1])
    pos:    [b, n]   (fractional positions in [0, k-1])
    returns [b, n]

    Mirrors reference tf_utils.py:207-230 (interp_1d) with the same
    clamp-to-edge behavior of sample_1d (tf_utils.py:202).
    """
    k = curves.shape[-1]
    i0 = jnp.floor(pos)
    i1 = i0 + 1.0
    w1 = pos - i0  # weight of the upper sample
    w0 = 1.0 - w1
    i0c = jnp.clip(i0.astype(jnp.int32), 0, k - 1)
    i1c = jnp.clip(i1.astype(jnp.int32), 0, k - 1)
    v0 = jnp.take_along_axis(curves, i0c, axis=-1)
    v1 = jnp.take_along_axis(curves, i1c, axis=-1)
    return w0 * v0 + w1 * v1


def apply_rf(x, rf):
    """Apply per-sample response curves to an image batch.

    x:  [b, ...]  values in [0, 1]
    rf: [b, k]    response curve samples
    returns [b, ...] tone-mapped values.

    Mirrors reference tf_utils.py:245-255.
    """
    b = x.shape[0]
    k = rf.shape[-1]
    flat = jnp.reshape(x, (b, -1))
    out = interp1d_batched(rf, (k - 1.0) * flat)
    return jnp.reshape(out, x.shape)
