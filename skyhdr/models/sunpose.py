"""Sun-pose estimator: 3 conv+maxpool stages -> 2 dense -> softmax over
h*w sun-position bins, exposing the three stage activations for Grad-CAM.

Mirrors reference sunpose_net.py:7-71. The forward optionally accepts
additive perturbations on the three activation maps — the zero-perturbation
gradient trick that lets a single jax.vjp recover d(y_c)/d(activation) for
Grad-CAM without TF's `tf.gradients`-inside-`stop_recording` machinery
(reference train.py:257-271); see skyhdr.models.gradcam.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from skyhdr.config import ModelConfig
from skyhdr.models.layers import InstanceNorm, conv, maxpool2
from skyhdr.ops.distortion import DAConv


class SunPoseLayer(nn.Module):
    """(conv-IN-relu) x2 (reference sunpose_net.py:7-30)."""

    cfg: ModelConfig
    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        dt = (jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else None)

        def _conv(name):
            if (self.cfg.use_da_conv and self.kernel == self.cfg.da_kernel_size):
                return DAConv(self.features, kernel_size=self.kernel,
                              dilation_rate=self.cfg.dilation_rate,
                              backend=self.cfg.da_backend, name=name)
            return conv(self.features, self.kernel, name=name, dtype=dt)

        fuse = self.cfg.fused_instance_norm
        x = InstanceNorm(name="norm1", fuse=fuse)(_conv("conv1")(x), act="relu")
        x = InstanceNorm(name="norm2", fuse=fuse)(_conv("conv2")(x), act="relu")
        return x


class SpatialDense(nn.Module):
    """Dense over a flattened [b, h, w, c] input WITHOUT the flatten.

    Param-tree-identical to `nn.Dense` on `x.reshape(b, -1)` (kernel
    [h*w*c, features], bias [features]; same initializers, same dtype
    promotion), but computed as einsum('bhwc,hwcd->bd') on the 4-D input.
    Why: under a dp x width GSPMD mesh the flatten is a reshape of a
    width-sharded tensor, which the SPMD partitioner can only serve by
    involuntary full rematerialization — replicating the activation every
    step (spmd_partitioner.cc warning in the r4 dryrun). A dot_general
    whose CONTRACTING dims carry the width sharding partitions natively:
    each shard contracts its local columns and XLA inserts one psum. The
    kernel reshape is free (replicated, layout-only)."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (h * w * c, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        dt = self.dtype or jnp.float32
        k4 = kernel.reshape(h, w, c, self.features)
        y = jnp.einsum("bhwc,hwcd->bd", x.astype(dt), k4.astype(dt))
        return y + bias.astype(dt)


class SunPoseNet(nn.Module):
    """Reference sunpose_net.py:32-71."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self, x, eps: Optional[Sequence[jnp.ndarray]] = None
    ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
        """Returns (softmax over h*w bins [b, h*w], activations a1/a2/a3 at
        full, 1/2 and 1/4 resolution with 32/64/128 channels)."""
        fc_dim = self.cfg.num_bins

        a1 = SunPoseLayer(self.cfg, 32, 7, name="sunlayer1")(x)
        if eps is not None:
            a1 = a1 + eps[0]
        p1 = maxpool2(a1)

        a2 = SunPoseLayer(self.cfg, 64, 3, name="sunlayer2")(p1)
        if eps is not None:
            a2 = a2 + eps[1]
        p2 = maxpool2(a2)

        a3 = SunPoseLayer(self.cfg, 128, 3, name="sunlayer3")(p2)
        if eps is not None:
            a3 = a3 + eps[2]
        p3 = maxpool2(a3)

        dt = (jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else None)
        y = nn.relu(SpatialDense(fc_dim, dtype=dt, name="fc1")(p3))
        y = nn.relu(nn.Dense(fc_dim, dtype=dt, name="fc2")(y))
        y = y.astype(jnp.float32)  # softmax over 4096 bins stays f32
        # Softmax over non-negative logits, as the reference applies softmax
        # after a relu (sunpose_net.py:68-70).
        sm = nn.softmax(y, axis=-1)
        return sm, (a1, a2, a3)

    def activation_shapes(self, batch: int):
        h, w = self.cfg.im_height, self.cfg.im_width
        return (
            (batch, h, w, 32),
            (batch, h // 2, w // 2, 64),
            (batch, h // 4, w // 4, 128),
        )
