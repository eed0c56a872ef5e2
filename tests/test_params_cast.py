"""bf16-weight serving (skyhdr.utils.params): cast utility semantics and
full-inference-graph closeness to f32 weights. The bandwidth rationale is in
the module docstring / BASELINE.md (h*w-wide sunpose FCs at 64x256,
reference sunpose_net.py:36-43)."""

import numpy as np
import jax
import jax.numpy as jnp

from skyhdr.config import Config, DataConfig, ModelConfig
from skyhdr.utils.params import cast_floating, cast_model_vars


def test_cast_floating_preserves_non_float():
    tree = {
        "w": jnp.ones((3, 3), jnp.float32),
        "step": jnp.asarray(7, jnp.int32),
        "mask": jnp.asarray([True, False]),
        "nested": {"b": jnp.zeros((2,), jnp.float64 if jax.config.x64_enabled
                                  else jnp.float32)},
    }
    out = cast_floating(tree, jnp.bfloat16)
    assert out["w"].dtype == jnp.bfloat16
    assert out["nested"]["b"].dtype == jnp.bfloat16
    assert out["step"].dtype == jnp.int32
    assert out["mask"].dtype == jnp.bool_


def test_cast_model_vars_leaves_batch_stats_f32():
    mv = {
        "params": {"dense": {"kernel": jnp.ones((4, 4), jnp.float32)}},
        "batch_stats": {"bn": {"mean": jnp.zeros((4,), jnp.float32)}},
    }
    out = cast_model_vars(mv, jnp.bfloat16)
    assert out["params"]["dense"]["kernel"].dtype == jnp.bfloat16
    assert out["batch_stats"]["bn"]["mean"].dtype == jnp.float32


def test_inference_bf16_weights_close_to_f32(rng):
    from skyhdr.train.engine import create_gan_state, make_inference_fn

    cfg = Config(model=ModelConfig(im_height=16, im_width=64),
                 data=DataConfig(batch_size=2))
    state = create_gan_state(cfg, jax.random.PRNGKey(0))
    infer = make_inference_fn(cfg, jit=False)
    x = jnp.asarray(rng.uniform(0, 1, size=(2, 16, 64, 3)).astype(np.float32))

    y32 = np.asarray(infer(state.gen_vars, state.sun_vars, x)["y_final_lin"])
    gv = cast_model_vars(state.gen_vars, jnp.bfloat16)
    sv = cast_model_vars(state.sun_vars, jnp.bfloat16)
    y16 = np.asarray(infer(gv, sv, x)["y_final_lin"].astype(jnp.float32))

    assert np.isfinite(y16).all()
    denom = np.abs(y32).mean() + 1e-3
    assert np.abs(y16 - y32).mean() / denom < 0.05
