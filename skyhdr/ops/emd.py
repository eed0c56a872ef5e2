"""Earth-mover's (Wasserstein-1) luminance comparison — eval metric.

Reference tf_utils.py:8-59 carries a TF transcription of SciPy's general
wasserstein_distance (it is never called by the training entry points; kept
here as the eval metric SURVEY.md §2.2 recommends). For two equal-size
empirical samples the general CDF formula collapses to the mean absolute
difference of the sorted samples, which is what we implement — one sort per
image instead of the reference's concat+sort+double-searchsorted. Verified
against scipy.stats.wasserstein_distance in tests.
"""

from __future__ import annotations

import jax.numpy as jnp


def wasserstein_1d(x, y):
    """W1 distance between the value distributions of x and y.

    x, y: [b, n] equal-length samples. Returns [b].
    """
    xs = jnp.sort(x, axis=-1)
    ys = jnp.sort(y, axis=-1)
    return jnp.mean(jnp.abs(xs - ys), axis=-1)


def compare_luminance(pred, gt):
    """Per-channel W1 averaged over RGB (reference tf_utils.py:38-59).

    pred, gt: [b, h, w, 3]. Returns [b, 1, 1, 1] as the reference does.
    """
    b = pred.shape[0]
    dists = []
    for ch in range(3):
        dists.append(
            wasserstein_1d(
                jnp.reshape(pred[..., ch], (b, -1)),
                jnp.reshape(gt[..., ch], (b, -1)),
            )
        )
    em = (dists[0] + dists[1] + dists[2]) / 3.0
    return jnp.reshape(em, (-1, 1, 1, 1))
