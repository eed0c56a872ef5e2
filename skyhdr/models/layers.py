"""Flax building blocks mirroring the reference's hand-rolled Keras layers.

  * conv / Conv wrapper          — reference ops.py:4-42
  * ResizeDeconv (resize-conv)   — reference ops.py:44-126 ('resize' method;
                                   resize-conv avoids checkerboard artifacts,
                                   see the distill.pub citation at ops.py:91)
  * InstanceNorm                 — tfa.layers.InstanceNormalization used all
                                   over reference generator.py/sunpose_net.py
  * Downsampling                 — reference discriminator.py:7-27 /
                                   sunrad_net.py:8-28 (conv-BN-LeakyReLU)

Initialization matches the reference: glorot_uniform conv kernels
(ops.py:11), normal(0, 0.02) for GAN downsampling convs
(discriminator.py:12).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import flax.linen as nn

from skyhdr.ops.foldconv import pick_fold, width_folded_conv
from skyhdr.ops.resize import resize_bilinear


def instance_moments(xf):
    """Per-(sample, channel) mean/variance over (H, W).

    Exposed as a module-level hook so experiments can swap strategies
    (tools/exp_in.py). Default: jnp.mean + jnp.var — two serialized reduce
    ops per call."""
    mean = jnp.mean(xf, axis=(-3, -2), keepdims=True)
    var = jnp.var(xf, axis=(-3, -2), keepdims=True)
    return mean, var


_ACT_ALPHA = {"none": 1.0, "relu": 0.0, "lrelu01": 0.1}


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalization over (H, W) with learned scale
    and offset. Matches tfa.layers.InstanceNormalization (epsilon=1e-3).

    `act` fuses the follower activation ('relu' | 'lrelu01' | 'none') into
    the op: with `fuse` (ModelConfig.fused_instance_norm) the whole
    normalize+activation runs as one Pallas kernel — one HBM read pass
    instead of XLA's separate moments-reduce + normalize passes
    (ops/pallas/instnorm.py has the profile evidence). The unfused path is
    bit-identical to the historical InstanceNorm-then-activation graph."""

    epsilon: float = 1e-3
    fuse: bool = False

    @nn.compact
    def __call__(self, x, act: str = "none"):
        c = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,))
        beta = self.param("bias", nn.initializers.zeros, (c,))
        if self.fuse:
            from skyhdr.ops.pallas.instnorm import (fused_in_supported,
                                                    instance_norm_act)
            if fused_in_supported(x.shape):
                return instance_norm_act(x, gamma, beta, eps=self.epsilon,
                                         alpha=_ACT_ALPHA[act])
        # Statistics in f32 even under bf16 compute for stability.
        xf = x.astype(jnp.float32)
        mean, var = instance_moments(xf)
        y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        y = (y * gamma + beta).astype(x.dtype)
        if act == "relu":
            return nn.relu(y)
        if act == "lrelu01":
            return leaky_relu_01(y)
        return y


class Conv2D(nn.Module):
    """SAME-padded conv, MXU-aware: stride-1 convs whose output-channel
    count understarves the 128-wide lane axis are width-folded
    (skyhdr.ops.foldconv — exact arithmetic, identical parameter tree to
    nn.Conv, so checkpoints and TF-transplant maps are unaffected).
    Profiled motivation in BASELINE.md: the 7x7->3ch decoders ran at
    3/128 lane occupancy (2.1 TF/s); co=32/64 layers waste 4x/2x.
    Strided convs fall back to a plain lax conv with nn.Conv's SAME
    semantics."""

    features: int
    kernel: int = 3
    strides: int = 1
    use_bias: bool = True
    init_scale: str = "glorot"
    dtype: any = None
    # ModelConfig.fold_tiny_convs: disabled under combined batch+width
    # GSPMD sharding, where XLA miscompiles the folded stride-F conv.
    fold: bool = True

    @nn.compact
    def __call__(self, x):
        ci = x.shape[-1]
        kinit = (nn.initializers.glorot_uniform()
                 if self.init_scale == "glorot"
                 else nn.initializers.normal(stddev=0.02))
        k = self.param("kernel", kinit,
                       (self.kernel, self.kernel, ci, self.features))
        b = (self.param("bias", nn.initializers.zeros, (self.features,))
             if self.use_bias else None)
        # nn.Conv dtype semantics: explicit dtype casts operands; None
        # promotes inputs and (f32) params to a common dtype.
        ct = self.dtype or jnp.promote_types(x.dtype, k.dtype)
        x = x.astype(ct)
        k = k.astype(ct)
        # Fold ONLY truly lane-starved outputs (co <= 8): measured on TPU,
        # folding co=32/64 convs REGRESSED b32 inference 5.00 -> 5.74 ms —
        # XLA's native schedule for mid-width convs already beats the
        # naive N-padding model (34 TF/s at co=32), and the fold's extra
        # FLOPs ((F+kw-1)/kw per output) then cost real time. The co=3
        # decoders went 0.56 -> ~0.01 ms; that is the regime this targets.
        if (self.fold and self.strides == 1 and self.features <= 8
                and pick_fold(x.shape[-2], self.features) > 1):
            return width_folded_conv(x, k, b)
        import jax.lax as lax
        y = lax.conv_general_dilated(
            x, k, (self.strides, self.strides), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y if b is None else y + b.astype(y.dtype)


def conv(features: int, kernel: int, strides: int = 1, *, name=None,
         use_bias: bool = True, init_scale: str = "glorot", dtype=None,
         fold: bool = True):
    """SAME-padded conv with the reference's initializers. `dtype` is the
    computation dtype (bf16 on TPU when ModelConfig.compute_dtype says so);
    params stay float32. Returns the MXU-aware Conv2D (param-compatible
    with nn.Conv)."""
    return Conv2D(features, kernel, strides, use_bias=use_bias,
                  init_scale=init_scale, dtype=dtype, fold=fold, name=name)


class ResizeDeconv(nn.Module):
    """Bilinear resize to `out_hw` followed by a SAME conv — the reference's
    'resize' deconv method (ops.py:90-124), kept because transpose convs
    checkerboard. The resize is two static matmuls (skyhdr.ops.resize)."""

    features: int
    out_hw: Tuple[int, int]
    kernel: int = 3
    dtype: any = None

    @nn.compact
    def __call__(self, x):
        x = resize_bilinear(x, self.out_hw)
        return conv(self.features, self.kernel, name="conv",
                    dtype=self.dtype)(x)


class Downsampling(nn.Module):
    """conv(k, s, no bias) -> [BatchNorm] -> LeakyReLU(0.3).

    Mirrors reference discriminator.py:7-27: Keras LeakyReLU defaults to
    alpha=0.3 (the generator path uses 0.1 explicitly — don't conflate).
    BatchNorm carries running stats in the `batch_stats` collection; pass
    `train=False` to consume them (the reference's `training=False` disc
    forward inside the generator step, train.py:302).
    """

    features: int
    kernel: int = 4
    strides: int = 2
    apply_norm: bool = True
    dtype: any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = conv(self.features, self.kernel, self.strides,
                 use_bias=False, init_scale="gan", name="conv",
                 dtype=self.dtype)(x)
        if self.apply_norm:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.99,
                epsilon=1e-3,
                dtype=self.dtype,
                name="bn",
            )(x)
        return nn.leaky_relu(x, 0.3)


def leaky_relu_01(x):
    """The generator-side activation (reference tf.nn.leaky_relu(x, 0.1))."""
    return nn.leaky_relu(x, 0.1)


def maxpool2(x):
    """2x2 max pool, stride 2, SAME (reference ops.py:287-300)."""
    return nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")


def avgpool2(x, kernel: int = 2):
    """Average pool (reference ops.py:302-315; unused by the active models,
    kept for op-library parity)."""
    return nn.avg_pool(x, (kernel, kernel), strides=(kernel, kernel),
                       padding="SAME")


class FC2D(nn.Module):
    """Flatten -> Dense -> [b, 1, 1, fc_dim] (reference ops.py:128-171)."""

    fc_dim: int

    @nn.compact
    def __call__(self, x):
        flat = x.reshape((x.shape[0], -1))
        y = nn.Dense(self.fc_dim,
                     kernel_init=nn.initializers.glorot_uniform())(flat)
        return y.reshape((-1, 1, 1, self.fc_dim))


class DFC2D(nn.Module):
    """De-fully-connected: [b, 1, 1, d] -> Dense -> [b, h, w, c]
    (reference ops.py:173-230)."""

    out_height: int
    out_width: int
    out_channels: int

    @nn.compact
    def __call__(self, x):
        flat = x.reshape((x.shape[0], -1))
        y = nn.Dense(self.out_height * self.out_width * self.out_channels,
                     kernel_init=nn.initializers.glorot_uniform())(flat)
        return y.reshape((-1, self.out_height, self.out_width,
                          self.out_channels))


class BatchNorm(nn.Module):
    """Manual BN with running stats (reference ops.py:232-285; the active
    models use Keras BN via Downsampling — this mirrors the hand-rolled
    variant with decay=0.9, eps=1e-5)."""

    decay: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.decay,
            epsilon=self.epsilon,
        )(x)
