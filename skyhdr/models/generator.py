"""Generator: shared conv encoder + residual trunk, twin resize-deconv
decoders (sky, sun), analytic sun-radiance head, additive blending.

Mirrors reference generator.py:51-174 structure exactly (active plain-conv
path; the distortion-aware variant is selected by ModelConfig.use_da_conv,
matching the reference's commented intent at generator.py:14,18).

All methods are pure; invoke with
  model.apply(vars, x, method=Generator.encode) etc.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import flax.linen as nn

from skyhdr.config import ModelConfig
from skyhdr.models.layers import InstanceNorm, ResizeDeconv, conv, leaky_relu_01
from skyhdr.models.sunrad import SunRadNet
from skyhdr.ops.resize import resize_bilinear
from skyhdr.ops.distortion import DAConv, DADeconv


def _dtype(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None


def _conv(cfg: ModelConfig, features: int, kernel: int, strides: int = 1, name=None):
    """Plain conv or distortion-aware conv per config (generator.py:13-14)."""
    if cfg.use_da_conv and kernel == cfg.da_kernel_size and strides == 1:
        return DAConv(features, kernel_size=kernel,
                      dilation_rate=cfg.dilation_rate,
                      backend=cfg.da_backend, name=name)
    return conv(features, kernel, strides, name=name, dtype=_dtype(cfg))


class ResBlock(nn.Module):
    """conv-IN-lrelu(0.1)-conv-IN + identity (reference generator.py:9-35)."""

    cfg: ModelConfig
    filters_in: int
    filters_out: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        fuse = self.cfg.fused_instance_norm
        y = _conv(self.cfg, self.filters_out, self.kernel, name="conv1")(x)
        y = InstanceNorm(name="norm1", fuse=fuse)(y, act="lrelu01")
        y = _conv(self.cfg, self.filters_out, self.kernel, name="conv2")(y)
        y = InstanceNorm(name="norm2", fuse=fuse)(y)
        if self.filters_in != self.filters_out:
            x = conv(self.filters_out, 1, name="identity")(x)
        return x + y


def _deconv(cfg: ModelConfig, features: int, out_hw, kernel: int = 3, name=None):
    if cfg.use_da_conv and kernel == cfg.da_kernel_size:
        return DADeconv(features, out_hw=tuple(out_hw), kernel_size=kernel,
                        dilation_rate=cfg.dilation_rate,
                        backend=cfg.da_backend, name=name)
    return ResizeDeconv(features, tuple(out_hw), kernel, name=name,
                        dtype=_dtype(cfg))


class Generator(nn.Module):
    """Reference generator.py:51-174 as a Flax module."""

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        h, w = cfg.im_height, cfg.im_width
        f1, f2, f3 = cfg.enc_filters

        fuse = cfg.fused_instance_norm

        # Encoder (generator.py:60-69).
        self.conv1_d = conv(f1, 7, 1, name="conv1_d")
        self.norm1_d = InstanceNorm(fuse=fuse)
        self.conv2_d = conv(f2, 3, 2, name="conv2_d")
        self.norm2_d = InstanceNorm(fuse=fuse)
        self.conv3_d = conv(f3, 3, 2, name="conv3_d")
        self.norm3_d = InstanceNorm(fuse=fuse)
        self.res_blocks = [
            ResBlock(cfg, f3, f3, cfg.da_kernel_size, name=f"res{i}")
            for i in range(cfg.num_res_blocks)
        ]

        # Sky decoder (generator.py:72-78).
        d1, d2 = cfg.dec_filters
        self.conv3_f = _deconv(cfg, d1, (h // 2, w // 2), name="conv3_f")
        self.norm3_f = InstanceNorm(fuse=fuse)
        self.conv2_f = _deconv(cfg, d2, (h, w), name="conv2_f")
        self.norm2_f = InstanceNorm(fuse=fuse)
        # The final 7x7 convs emit 3 channels; conv() width-folds them so
        # the MXU's 128-lane output axis is not 3/128 occupied
        # (skyhdr.ops.foldconv; profiled at 0.56 ms each of a 4.8 ms graph).
        self.conv1_f = conv(cfg.channels, 7, 1, name="conv1_f",
                            fold=cfg.fold_tiny_convs)

        # Sun decoder (generator.py:81-87).
        self.conv3_u = _deconv(cfg, d1, (h // 2, w // 2), name="conv3_u")
        self.norm3_u = InstanceNorm(fuse=fuse)
        self.conv2_u = _deconv(cfg, d2, (h, w), name="conv2_u")
        self.norm2_u = InstanceNorm(fuse=fuse)
        self.conv1_u = conv(cfg.channels, 7, 1, name="conv1_u",
                            fold=cfg.fold_tiny_convs)

        # Sun-radiance head (generator.py:90). Its conv trunk follows the
        # compute dtype; the Dirac-delta radiance math itself is pinned to
        # f32 inside SunRadNet (values up to 3e4).
        self.sun = SunRadNet(clip_value=cfg.sun_rad_clip, dtype=_dtype(cfg))

    def encode(self, x):
        """conv x3 + residual trunk (reference generator.py:92-108)."""
        y = self.norm1_d(self.conv1_d(x), act="lrelu01")
        y = self.norm2_d(self.conv2_d(y), act="lrelu01")
        y = self.norm3_d(self.conv3_d(y), act="lrelu01")
        for block in self.res_blocks:
            y = block(y)
        return y

    def sky_decode(self, x, inp):
        """Two resize-deconvs + 7x7 conv + input skip-add + relu
        (reference generator.py:110-125). Output is gamma-domain sky."""
        y = self.norm3_f(self.conv3_f(x), act="lrelu01")
        y = self.norm2_f(self.conv2_f(y), act="lrelu01")
        y = leaky_relu_01(self.conv1_f(y))
        return nn.relu(inp + y)

    def sun_decode(self, x, sun_rad):
        """Sun decoder; adds the analytic radiance in gamma domain to
        preserve the sun peak (reference generator.py:127-156 — the shipped
        path has no CAM skip connections)."""
        y = self.norm3_u(self.conv3_u(x), act="lrelu01")
        y = self.norm2_u(self.conv2_u(y), act="lrelu01")
        y = leaky_relu_01(self.conv1_u(y))
        return nn.relu(sun_rad + y)

    def sun_rad_estimation(self, ldr, sun_cam1, sun_cam2, sun_cam3, sunpose_pred,
                           train: bool = True):
        """Dirac-delta sun radiance from LDR + CAM attention
        (reference generator.py:158-169)."""
        h, w = self.cfg.im_height, self.cfg.im_width
        normed = sunpose_pred / jnp.max(sunpose_pred)
        cam2 = resize_bilinear(sun_cam2, (h, w))
        cam3 = resize_bilinear(sun_cam3, (h, w))
        feats = jnp.concatenate([ldr, sun_cam1, cam2, cam3], axis=-1)
        sun_rad, gamma, beta = self.sun(normed, feats, train=train)
        return jnp.tile(sun_rad, (1, 1, 1, self.cfg.channels)), gamma, beta

    def blending(self, sky_pred, sun_pred):
        """Additive blend (reference generator.py:171-174)."""
        return sky_pred + sun_pred

    def __call__(self, x, train: bool = False):
        """Full inference forward (and init wiring: a single init()
        materializes all parameters). Training uses the split methods."""
        h, w = self.cfg.im_height, self.cfg.im_width
        res = self.encode(x)
        sky = self.sky_decode(res, x)
        b = x.shape[0]
        cam1 = jnp.zeros((b, h, w, 1), x.dtype)
        cam2 = jnp.zeros((b, h // 2, w // 2, 1), x.dtype)
        cam3 = jnp.zeros((b, h // 4, w // 4, 1), x.dtype)
        pose = jnp.full((b, h, w, 1), 1.0 / (h * w), x.dtype)
        sun_rad, gamma, beta = self.sun_rad_estimation(
            x, cam1, cam2, cam3, pose, train=train
        )
        sun = self.sun_decode(res, sun_rad)
        return self.blending(sky, sun)
