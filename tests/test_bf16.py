"""bf16 compute-dtype path: outputs stay finite and close to f32 (the
radiance path is pinned f32 by design, ModelConfig.compute_dtype docstring)."""

import numpy as np
import jax
import jax.numpy as jnp

from skyhdr.config import ModelConfig
from skyhdr.models import Generator, SunPoseNet


def test_generator_bf16_close_to_f32(rng):
    x = jnp.asarray(rng.uniform(0, 1, size=(2, 16, 64, 3)).astype(np.float32))
    cfg32 = ModelConfig(im_height=16, im_width=64)
    cfg16 = ModelConfig(im_height=16, im_width=64, compute_dtype="bfloat16")
    g32 = Generator(cfg32)
    g16 = Generator(cfg16)
    v = g32.init(jax.random.PRNGKey(0), x)
    y32 = np.asarray(g32.apply(v, x))
    y16 = np.asarray(g16.apply(v, x).astype(jnp.float32))
    assert np.isfinite(y16).all()
    # bf16 activations: within ~2% of the f32 path on this smooth input.
    denom = np.abs(y32).mean() + 1e-3
    assert np.abs(y16 - y32).mean() / denom < 0.05


def test_sunpose_bf16_probabilities(rng):
    x = jnp.asarray(rng.uniform(0, 1, size=(2, 16, 64, 3)).astype(np.float32))
    cfg = ModelConfig(im_height=16, im_width=64, compute_dtype="bfloat16")
    net = SunPoseNet(cfg)
    v = net.init(jax.random.PRNGKey(0), x)
    sm, acts = net.apply(v, x)
    assert sm.dtype == jnp.float32  # softmax pinned f32
    np.testing.assert_allclose(np.asarray(sm.sum(-1)), 1.0, rtol=1e-5)
