"""Frozen VGG16 perceptual backbone (conv1_1 .. pool3).

Mirrors reference vgg16.py:88-166: loads the SingleHDR `vgg16.npy` weight
dict (keys 'conv1_1'.. each [filter_HWIO, bias]), mean-subtract
preprocessing, returns (pool1, pool2, pool3) for the perceptual L1 loss.
Weights are **constants** baked into the jitted graph (vgg16.py:38-41 uses
tf.constant), so they never appear in optimizer state.

Deviation by design: this framework runs RGB end-to-end (the reference runs
BGR because of OpenCV ingestion, vgg16.py:133-141). The npy kernels expect
BGR input, so conv1_1's input-channel axis is flipped at load time and the
mean subtraction uses RGB order — identical math on identically-loaded
images.

If no weight file exists, `random_vgg16_weights` provides a deterministic
He-initialized frozen backbone so training/benchmarks run hermetically (the
real file is user-supplied in the reference too, README.md:69-70).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax.numpy as jnp
from jax import lax

# ImageNet means, RGB order (reference vgg16.py:89 stores BGR order).
VGG_MEAN_RGB = (123.68, 116.779, 103.939)

_LAYERS = (
    ("conv1_1", 3, 64), ("conv1_2", 64, 64),
    ("conv2_1", 64, 128), ("conv2_2", 128, 128),
    ("conv3_1", 128, 256), ("conv3_2", 256, 256), ("conv3_3", 256, 256),
)
_POOL_AFTER = {"conv1_2", "conv2_2", "conv3_3"}


def load_vgg16_npy(path: str) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """Parse the SingleHDR vgg16.npy dict (reference vgg16.py:99)."""
    data = np.load(path, encoding="latin1", allow_pickle=True).item()
    out = {}
    for name, cin, cout in _LAYERS:
        w = np.asarray(data[name][0], np.float32)  # [kh, kw, cin, cout]
        b = np.asarray(data[name][1], np.float32)
        assert w.shape == (3, 3, cin, cout), (name, w.shape)
        if name == "conv1_1":
            # npy kernels consume BGR; flip input channels to consume RGB.
            w = w[:, :, ::-1, :]
        out[name] = (w, b)
    return out


def random_vgg16_weights(seed: int = 0) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """Deterministic He-normal frozen stand-in when vgg16.npy is absent."""
    rng = np.random.default_rng(seed)
    out = {}
    for name, cin, cout in _LAYERS:
        std = np.sqrt(2.0 / (3 * 3 * cin))
        w = rng.normal(0.0, std, size=(3, 3, cin, cout)).astype(np.float32)
        b = np.zeros((cout,), np.float32)
        out[name] = (w, b)
    return out


def vgg16_features(weights, rgb01, dtype=jnp.float32):
    """rgb01: [b, h, w, 3] in [0, 1] -> (pool1, pool2, pool3).

    Mirrors reference vgg16.py:127-166 (x255 scaling + mean subtraction +
    conv/relu/maxpool pyramid). Pure function; `weights` is a dict of
    constants.

    `dtype` is the conv compute/constant dtype. The default keeps the f32
    path bit-identical; under ModelConfig.compute_dtype='bfloat16' the GAN
    loss passes bf16, which halves the backbone's MXU/HBM cost (the frozen
    features only feed an L1 loss, so this is the textbook mixed-precision
    target; preprocessing stays f32 so the x255/mean math doesn't quantize
    the [0,1] input).
    """
    x = rgb01.astype(jnp.float32) * 255.0
    mean = jnp.asarray(VGG_MEAN_RGB, jnp.float32)
    x = (x - mean).astype(dtype)

    outs = []
    for name, _, _ in _LAYERS:
        w, b = weights[name]
        x = lax.conv_general_dilated(
            x, jnp.asarray(w, dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.asarray(b, dtype)
        x = jnp.maximum(x, 0.0)
        if name in _POOL_AFTER:
            # NB: the init value must stay a python scalar (weak-typed to
            # x.dtype) — a traced array init breaks reduce_window's
            # reverse-mode AD inside the jitted train step.
            x = lax.reduce_window(
                x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "SAME"
            )
            outs.append(x)
    return tuple(outs)


def perceptual_l1(weights, pred_gamma, target_gamma, dtype=jnp.float32):
    """Sum of mean-|.| over pool1-3 features (reference train.py:308-313).

    The per-level means accumulate in f32 regardless of the feature dtype."""
    fp = vgg16_features(weights, pred_gamma, dtype)
    ft = vgg16_features(weights, target_gamma, dtype)
    loss = 0.0
    for a, b in zip(fp, ft):
        loss = loss + jnp.mean(jnp.abs(a - b), dtype=jnp.float32)
    return loss
