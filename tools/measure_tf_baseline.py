"""Measure the reference implementation's TF-CPU throughput.

Imports the reference modules from /root/reference (read-only) and times the
inference-path graph (reference inference.py:81-115: encode -> sky_decode ->
sunpose + Grad-CAM -> sun_rad -> sun_decode -> blend) under @tf.function on
CPU. Numbers land in BASELINE.md and seed bench.py's vs_baseline ratio.

Usage: python tools/measure_tf_baseline.py [--batch 32] [--iters 20]
"""

import argparse
import os
import sys
import time

os.environ["CUDA_VISIBLE_DEVICES"] = "-1"
sys.path.insert(0, "/root/reference")

import numpy as np
import tensorflow as tf  # noqa: E402

# tensorflow_addons is not installed in this image; shim the two symbols the
# reference uses. InstanceNormalization == GroupNormalization(groups=-1)
# (that is literally tfa's implementation); gaussian_filter2d is only used
# by the DoG loss, not the inference path.
import types

_tfa = types.ModuleType("tensorflow_addons")
_tfa.layers = types.ModuleType("tensorflow_addons.layers")


class InstanceNormalization(tf.keras.layers.GroupNormalization):
    def __init__(self, **kw):
        kw.setdefault("groups", -1)
        kw.setdefault("name", "instance_normalization")
        super().__init__(**kw)


_InstanceNorm = InstanceNormalization


_tfa.layers.InstanceNormalization = _InstanceNorm
_tfa.image = types.ModuleType("tensorflow_addons.image")
_tfa.image.gaussian_filter2d = None
sys.modules["tensorflow_addons"] = _tfa
sys.modules["tensorflow_addons.layers"] = _tfa.layers
sys.modules["tensorflow_addons.image"] = _tfa.image

# The reference uses np.math.pi (removed in modern NumPy).
import math

np.math = math

# Keras 3 rejects non-tensor positional args (the reference passes
# `training` positionally everywhere, e.g. sunpose_net.py:55,
# sunrad_net.py:25). Patch the Layer base __call__ to reroute a trailing
# bool/str positional into the training kwarg. tf.keras's lazy module
# re-resolves attributes, so the patch must land on the real class.
import keras


def _shift_training(args, kw):
    if len(args) >= 2 and isinstance(args[-1], (bool, str)):
        kw.setdefault("training",
                      args[-1] if isinstance(args[-1], bool) else True)
        args = args[:-1]
    return args, kw


_Layer = keras.src.layers.layer.Layer
_orig_layer_call = _Layer.__call__


def _patched_call(self, *args, **kw):
    args, kw = _shift_training(args, kw)
    return _orig_layer_call(self, *args, **kw)


_Layer.__call__ = _patched_call


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--height", type=int, default=32)
    ap.add_argument("--width", type=int, default=128)
    args = ap.parse_args()

    import generator as g  # reference modules
    import sunpose_net as sun_mod
    import grad_cam
    import tf_utils

    H, W, B = args.height, args.width, args.batch
    _gen = g.model(batch_size=B, im_height=H, im_width=W,
                   da_kernel_size=3, dilation_rate=1)
    _sun = sun_mod.model(im_height=H, im_width=W, da_kernel_size=3,
                         dilation_rate=1)

    @tf.function
    def generator_in_step(ldr):
        # Transcribed control flow of reference inference.py:81-115.
        thr = 0.12
        res_out = _gen.encode(ldr, training=False)
        sky_pred_gamma = _gen.sky_decode(res_out, ldr, training=False)
        sky_pred_lin = tf_utils.hdr_logDecompression(sky_pred_gamma)
        sunpose_cmf, actv = _sun.sunposeEstimation(ldr, training=False)
        sunpose_pred = tf.reshape(sunpose_cmf, (-1, H, W, 1))
        alpha = tf.reduce_max(sky_pred_lin, axis=[3])
        alpha = tf.minimum(1.0, tf.maximum(0.0, alpha - 1.0 + thr) / thr)
        alpha_c1 = tf.reshape(alpha, [-1, H, W, 1])
        alpha_c3 = tf.tile(alpha_c1, [1, 1, 1, 3])
        y_c = tf.math.reduce_max(sunpose_cmf, axis=1)
        cam1 = grad_cam.layer(y_c, actv[0])
        cam2 = grad_cam.layer(y_c, actv[1])
        cam3 = grad_cam.layer(y_c, actv[2])
        sun_rad_lin, gamma, beta = _gen.sun_rad_estimation(
            ldr, cam1, cam2, cam3, sunpose_pred, training=False)
        sun_rad_gamma = tf_utils.hdr_logCompression(sun_rad_lin)
        sun_pred_gamma = _gen.sun_decode(res_out, cam1, cam2, cam3,
                                         sun_rad_gamma, training=False)
        sky_pred_gamma = (1. - alpha_c3) * sky_pred_gamma
        sun_pred_gamma = alpha_c3 * sun_pred_gamma
        y_final_gamma = _gen.blending(sky_pred_gamma, sun_pred_gamma,
                                      training=False)
        return tf_utils.hdr_logDecompression(y_final_gamma)

    x = tf.constant(np.random.default_rng(0).uniform(
        0, 1, size=(B, H, W, 3)).astype(np.float32))

    # Warmup/trace.
    y = generator_in_step(x)
    _ = y.numpy()

    t0 = time.perf_counter()
    for _ in range(args.iters):
        y = generator_in_step(x)
    _ = y.numpy()
    dt = time.perf_counter() - t0
    per_sec = B * args.iters / dt
    print(f"reference TF-CPU inference ({H}x{W}, batch {B}): "
          f"{per_sec:.2f} panoramas/s  ({dt/args.iters*1000:.1f} ms/step)")


if __name__ == "__main__":
    main()
