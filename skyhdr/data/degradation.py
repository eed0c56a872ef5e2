"""LDR degradation model — the SingleHDR-style HDR->LDR simulation, fully
on device.

Reference train.py:54-94 (_preprocessing) runs this per batch in a
`tf.py_function` on the host, serializing the input pipeline (SURVEY.md
§3.1); its RNG is also split-brain (fixed seed=1 on noise draws, unseeded
numpy for exposure/CRF picks — train.py:58-59,67-73). Here the whole chain —
exposure, shot+read noise, clipping, camera response, 8-bit quantization,
JPEG simulation — is pure JAX under one threaded PRNG key and jits into the
train step.

Pipeline (semantics preserved 1:1 unless noted):
  1. random exposure t from the 2^linspace(-3,3) bank        (train.py:59,64)
  2. shot noise  sigma_s ~ U[0, 0.08/6] per (sample, channel) (train.py:67)
     read noise  sigma_c ~ U[0, 0.005]                        (train.py:69)
     x = relu(hdr*t + N*sigma_s*(hdr*t) + N*sigma_c)          (train.py:70-75)
  3. clip to [0, 1]                                           (train.py:78)
  4. random DoRF camera response curve                        (train.py:58,81)
  5. quantize to 8 bit + JPEG round-trip, quality ramp
     round(i/(b-1)*10+90) across the batch                    (train.py:84-92)
     — simulated with the on-device DCT quantization model
     (skyhdr.ops.jpeg) instead of a host libjpeg call.

Returns (hdr_t, ldr): the exposed/noised HDR target and the degraded LDR
input, exactly the pair the reference feeds to train_step (train.py:94).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from skyhdr.ops.crf import apply_rf, apply_rf_chebyshev, chebyshev_fit
from skyhdr.ops.jpeg import jpeg_simulate


class DegradationBanks(NamedTuple):
    """Static host-loaded banks: CRF curves [n, k], exposures [m], and
    optional Chebyshev CRF coefficients [n, d].

    When `crf_coeffs` is present the degradation evaluates CRFs with the
    gather-free Clenshaw path (a batched-LUT gather fused into the pipeline
    costs ~9 ms/step on TPU — 10x everything else combined; the warped
    Chebyshev fit is accurate to ~2e-3, below the 8-bit quantization that
    follows). Build with `make_banks` to get the coefficients for free.
    """

    crfs: jnp.ndarray
    exposures: jnp.ndarray
    crf_coeffs: Optional[jnp.ndarray] = None


def make_banks(crfs, exposures, fit_chebyshev: bool = True) -> DegradationBanks:
    coeffs = jnp.asarray(chebyshev_fit(crfs)) if fit_chebyshev else None
    return DegradationBanks(jnp.asarray(crfs), jnp.asarray(exposures), coeffs)


def jpeg_quality_ramp(batch: int, lo: float = 90.0, hi: float = 100.0):
    """Per-sample quality round(i/(b-1)*(hi-lo)+lo) (reference train.py:89)."""
    i = jnp.arange(batch, dtype=jnp.float32)
    denom = jnp.maximum(batch - 1, 1)
    return jnp.round(i / denom * (hi - lo) + lo)


def degrade_batch(key, hdr, banks: DegradationBanks, *,
                  jpeg_lo: float = 90.0, jpeg_hi: float = 100.0,
                  sigma_s_scale: float = 0.08 / 6.0,
                  sigma_c_scale: float = 0.005,
                  chroma_subsample: bool = True):
    """hdr: [b, h, w, 3] mean-normalized HDR. Returns (hdr_t, ldr)."""
    b = hdr.shape[0]
    k_crf, k_t, k_ss, k_sc, k_ns, k_nc = jax.random.split(key, 6)

    t_idx = jax.random.randint(k_t, (b,), 0, banks.exposures.shape[0])
    t = banks.exposures[t_idx].reshape(b, 1, 1, 1)
    hdr_t = hdr * t

    sigma_s = sigma_s_scale * jax.random.uniform(k_ss, (b, 1, 1, 3))
    sigma_c = sigma_c_scale * jax.random.uniform(k_sc, (b, 1, 1, 3))
    noise_s = jax.random.normal(k_ns, hdr_t.shape) * (sigma_s * hdr_t)
    noise_c = jax.random.normal(k_nc, hdr_t.shape) * sigma_c
    hdr_t = jax.nn.relu(hdr_t + noise_s + noise_c)

    clipped = jnp.clip(hdr_t, 0.0, 1.0)

    crf_idx = jax.random.randint(k_crf, (b,), 0, banks.crfs.shape[0])
    if banks.crf_coeffs is not None:
        ldr = apply_rf_chebyshev(clipped, banks.crf_coeffs[crf_idx])
    else:
        ldr = apply_rf(clipped, banks.crfs[crf_idx])

    quality = jpeg_quality_ramp(b, jpeg_lo, jpeg_hi)
    ldr = jpeg_simulate(ldr, quality, chroma_subsample=chroma_subsample)

    return hdr_t, ldr
