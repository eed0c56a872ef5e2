"""Width-folded conv (skyhdr.ops.foldconv / layers.Conv2D) equivalence.

The fold is an exact reassociation of a SAME stride-1 conv: same parameter
tree as nn.Conv, same outputs to f32 roundoff, exact gradients. It only
activates for lane-starved outputs (co <= 8, BASELINE.md 2026-08-18); the
plain fallback must match nn.Conv bit-for-bit including TF's asymmetric
SAME padding for even kernels (the PatchGAN 4x4 logit conv).
"""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import pytest

from skyhdr.models.layers import Conv2D
from skyhdr.ops.foldconv import pick_fold, width_folded_conv


CASES = [
    # (h, w, ci, co, k, s) — co=3 folded 7x7 decoders, even-kernel stride-1
    # logit conv, strided disc conv (plain), wide resblock conv (plain).
    (32, 128, 64, 3, 7, 1),
    (4, 13, 64, 1, 4, 1),
    (16, 64, 32, 64, 4, 2),
    (8, 32, 96, 8, 3, 1),
]


@pytest.mark.parametrize("h,w,ci,co,k,s", CASES)
def test_conv2d_matches_nn_conv(h, w, ci, co, k, s):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, h, w, ci)).astype(np.float32))
    ref = nn.Conv(co, (k, k), strides=(s, s), padding="SAME",
                  kernel_init=nn.initializers.glorot_uniform())
    v = ref.init(jax.random.PRNGKey(0), x)
    y0 = np.asarray(ref.apply(v, x))
    y1 = np.asarray(Conv2D(co, k, s).apply(v, x))
    assert y0.shape == y1.shape
    np.testing.assert_allclose(y1, y0, rtol=2e-5, atol=2e-5)


def test_folded_gradients_exact():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 32, 16)).astype(np.float32))
    W = jnp.asarray(rng.standard_normal((7, 7, 16, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((3,)).astype(np.float32))

    def plain(x, W, b):
        y = jax.lax.conv_general_dilated(
            x, W, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(jnp.tanh(y + b))

    def folded(x, W, b):
        return jnp.sum(jnp.tanh(width_folded_conv(x, W, b)))

    assert pick_fold(32, 3) > 1
    for arg in range(3):
        g0 = jax.grad(plain, arg)(x, W, b)
        g1 = jax.grad(folded, arg)(x, W, b)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=2e-4, atol=2e-4)


def test_pick_fold_bounds():
    assert pick_fold(128, 3) == 32          # 3*32=96 <= 128, divides 128
    assert pick_fold(128, 128) == 1         # no useful fold
    assert pick_fold(13, 1) == 13           # degenerate single block
    assert pick_fold(127, 3, max_lanes=128) == 1  # prime width: no divisor
