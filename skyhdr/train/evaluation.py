"""Eval metrics: PSNR, si-RMSE (scale-invariant, log domain), EMD luminance.

The reference publishes no metric code (numbers live in the IEEE Access
paper; the EMD helper in tf_utils.py:8-59 is dead code, SURVEY.md §2.2).
These are the standard definitions used by that paper's comparisons, kept
here so BASELINE parity on Laval/CAU can be scored.
"""

from __future__ import annotations

import jax.numpy as jnp

from skyhdr.ops.emd import compare_luminance


def psnr(pred, target, max_val: float = None):
    """Per-image PSNR over [b, h, w, c]; max_val defaults to target max."""
    if max_val is None:
        max_val = jnp.max(target)
    mse = jnp.mean(jnp.square(pred - target), axis=(1, 2, 3))
    return 10.0 * jnp.log10((max_val**2) / jnp.maximum(mse, 1e-12))


def si_rmse(pred, target, eps: float = 1e-6):
    """Scale-invariant RMSE in log space (Eigen et al.): per image,
    sqrt(mean(d^2) - mean(d)^2) with d = log(pred) - log(target)."""
    d = jnp.log(jnp.maximum(pred, eps)) - jnp.log(jnp.maximum(target, eps))
    d = d.reshape(d.shape[0], -1)
    return jnp.sqrt(jnp.maximum(jnp.mean(d**2, -1) - jnp.mean(d, -1) ** 2, 0.0))


def emd_luminance(pred, target):
    """Wasserstein-1 of per-channel value distributions, averaged over RGB
    (the reference's compare_luminance eval metric)."""
    return compare_luminance(pred, target)[:, 0, 0, 0]


def evaluate_batch(pred, target):
    return {
        "psnr": psnr(pred, target),
        "si_rmse": si_rmse(pred, target),
        "emd": emd_luminance(pred, target),
    }
