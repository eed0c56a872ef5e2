"""Width-folded convolution for tiny output-channel counts.

The generator's final 7x7 convs emit 3 channels (reference generator.py:77,
87: `conv1_f`/`conv1_u` produce the RGB sky/sun maps). On the MXU the
output-channel dim is the 128-wide lane axis, so N=3 wastes 125/128 lanes:
profiled at 2.1 TF/s — exactly 3/128 of the chip's calibrated bf16 rate —
and 0.56 ms each at 32x128 b32 (23% of the whole inference graph;
tools/profile_infer.py 2026-08-18).

Fix: fold a factor F of the panorama width into the output channels. A
stride-1 SAME conv with a (kh, kw) kernel and co outputs is EXACTLY a
stride-(1, F) conv with a (kh, F+kw-1) kernel and F*co outputs, where
output block j, phase p, channel o reads the same input window:

    y[i, j*F + p, o] = sum_{dh,dw} W[dh, dw, c, o] * x[i+dh-ph, j*F+p+dw-pw]
                     = conv(x_padded, Kf)[i, j, p*co + o]
    Kf[dh, u, c, p*co + o] = W[dh, u - p, c, o]   (0 <= u - p < kw)

FLOP overhead is (F+kw-1)/kw per output, but MXU time is ~K*128 per
output row regardless of N<=128, so wall time scales like (1 + (kw-1)/F)
vs kw for the unfolded conv — ~6x for kw=7, F=32. The folded kernel is
built from the stored (kh, kw, ci, co) parameter with one einsum against a
static 0/1 selector, so parameter trees, checkpoints, and TF-transplant
parity maps are unchanged and gradients flow exactly.

SHARDING CAVEAT: under GSPMD, the folded stride-F conv is MISCOMPILED by
XLA's SPMD partitioner when the width axis is sharded together with a
sharded batch — wrong values, not a slowdown (verified 2026-08-19 on an
8-device mesh: exact at (data=8,width=1) and (1,2), relerr ~1 at (2,2)
and (4,2); the divergence is in the conv itself, pre-reshape, and occurs
with both explicit-pad and conv-native padding). Single-device and
data-parallel-only uses are exact. ModelConfig.fold_tiny_convs gates the
fold; skyhdr.parallel routes it off whenever width sharding is requested
(parallel/dp.py:_mesh_cfg).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


@functools.lru_cache(maxsize=None)
def _selector(fold: int, kw: int) -> np.ndarray:
    """[F+kw-1, F, kw] 0/1 tensor: S[u, p, d] = 1 iff u == p + d."""
    s = np.zeros((fold + kw - 1, fold, kw), np.float32)
    for p in range(fold):
        for d in range(kw):
            s[p + d, p, d] = 1.0
    return s


def pick_fold(width: int, co: int, max_lanes: int = 128) -> int:
    """Largest divisor F of `width` with co*F <= max_lanes (1 = no fold)."""
    best = 1
    for f in range(2, width + 1):
        if width % f == 0 and co * f <= max_lanes:
            best = f
    return best


def _folded_fwd_only(x, kernel, f, precision):
    """The folded forward schedule (no bias)."""
    b, h, w, ci = x.shape
    kh, kw, _, co = kernel.shape
    dn = ("NHWC", "HWIO", "NHWC")
    sel = jnp.asarray(_selector(f, kw), kernel.dtype)
    # Kf[dh, u, c, p, o] = sum_d S[u, p, d] W[dh, d, c, o]
    kf = jnp.einsum("upd,hdco->hucpo", sel, kernel)
    kf = kf.reshape(kh, f + kw - 1, ci, f * co)
    # TF/flax SAME convention: lo = (k-1)//2, hi = k//2 (differs for even k,
    # e.g. the PatchGAN's 4x4 stride-1 logit conv, discriminator.py:38).
    pw = (kw - 1) // 2
    xw = jnp.pad(x, ((0, 0), (0, 0), (pw, kw // 2), (0, 0)))
    y = lax.conv_general_dilated(
        xw, kf, (1, f), (((kh - 1) // 2, kh // 2), (0, 0)),
        dimension_numbers=dn, precision=precision)
    return y.reshape(b, h, w, co)


def _plain_fwd_only(x, kernel, precision):
    return lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _folded_conv_core(x, kernel, f, precision):
    return _folded_fwd_only(x, kernel, f, precision)


def _folded_conv_core_fwd(x, kernel, f, precision):
    return _folded_fwd_only(x, kernel, f, precision), (x, kernel)


def _folded_conv_core_bwd(f, precision, res, dy):
    """Gradients via the PLAIN conv's vjp.

    Autodiff of the folded forward makes XLA compute the gradient w.r.t.
    the (kh, F+kw-1, ci, F*co) folded kernel — profiled at 2.1 TF/s /
    2.9 ms per conv1_f at 32x128 b32 (a multiply-reduce over the padded
    input, 30% of the whole train step for the two decoders). The plain
    conv's kernel/input gradients are ordinary well-scheduled convs, and
    the folded forward computes the SAME linear map, so its exact vjp is
    the plain conv's vjp."""
    x, kernel = res
    _, vjp = jax.vjp(lambda xx, kk: _plain_fwd_only(xx, kk, precision),
                     x, kernel)
    return vjp(dy)


_folded_conv_core.defvjp(_folded_conv_core_fwd, _folded_conv_core_bwd)


def width_folded_conv(x, kernel, bias=None, fold=None, precision=None):
    """SAME stride-1 conv via width->output-channel folding.

    x: [b, h, w, ci]; kernel: [kh, kw, ci, co]; returns [b, h, w, co].
    Exact (same arithmetic per output, reassociated only by the MXU tile
    order); gradients are the plain conv's (custom_vjp — see
    _folded_conv_core_bwd). Falls back to a plain conv when no useful fold
    exists.
    """
    w = x.shape[-2]
    co = kernel.shape[-1]
    f = pick_fold(w, co) if fold is None else fold
    if f <= 1 or w % f:
        return _plain(x, kernel, bias,
                      ("NHWC", "HWIO", "NHWC"), precision)
    y = _folded_conv_core(x, kernel, f, precision)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def _plain(x, kernel, bias, dn, precision):
    y = lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME", dimension_numbers=dn, precision=precision)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
