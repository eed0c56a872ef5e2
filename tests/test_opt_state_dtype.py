"""bf16 optimizer-state storage (TrainConfig.opt_state_dtype).

Moments live in bfloat16 at rest — halving the optimizer slice of HBM
residency and checkpoint bytes (at 64x256 the reference's h*w-wide sunpose
FCs, sunpose_net.py:36, make the RMSprop nu 3.3 GB f32) — while the update
math runs in f32 (engine._with_state_dtype). Params must stay f32.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skyhdr.config import Config, DataConfig, ModelConfig, TrainConfig
from skyhdr.data.degradation import DegradationBanks
from skyhdr.data.pipeline import synthetic_dataset
from skyhdr.models.vgg16 import random_vgg16_weights
from skyhdr.train import (
    create_gan_state,
    create_sun_state,
    make_gan_train_step,
    make_sun_train_step,
)
from skyhdr.utils.io import get_exposure_lists, make_synthetic_dorf


def _cfg(opt_state_dtype, grad_dtype="float32"):
    return Config(
        model=ModelConfig(im_height=16, im_width=64),
        data=DataConfig(batch_size=4),
        train=TrainConfig(learning_rate=1e-4,
                          opt_state_dtype=opt_state_dtype,
                          grad_dtype=grad_dtype),
    )


@pytest.fixture(scope="module")
def banks():
    return DegradationBanks(
        crfs=jnp.asarray(make_synthetic_dorf(8, 256)),
        exposures=jnp.asarray(get_exposure_lists()[1]),
    )


@pytest.fixture(scope="module")
def batch():
    cfg = _cfg("float32")
    ds = synthetic_dataset(cfg.data.batch_size, imshape=cfg.model.imshape,
                           batch_size=cfg.data.batch_size)
    b = next(iter(ds))
    return {"hdr": jnp.asarray(b["hdr"]),
            "elevation": jnp.asarray(b["elevation"])}


def _float_dtypes(tree):
    return {jnp.dtype(x.dtype) for x in jax.tree_util.tree_leaves(tree)
            if jnp.issubdtype(x.dtype, jnp.floating)}


def test_bf16_opt_state_dtypes_after_init_and_step(banks, batch):
    cfg = _cfg("bfloat16")
    state = create_gan_state(cfg, jax.random.PRNGKey(0))
    assert _float_dtypes((state.opt_gen, state.opt_disc)) == {jnp.dtype("bfloat16")}
    # Params are untouched by the storage dtype.
    assert _float_dtypes(state.gen_vars["params"]) == {jnp.dtype("float32")}

    step = make_gan_train_step(cfg, banks, random_vgg16_weights())
    state, metrics = step(state, batch, jax.random.PRNGKey(7))
    assert _float_dtypes((state.opt_gen, state.opt_disc)) == {jnp.dtype("bfloat16")}
    assert _float_dtypes(state.gen_vars["params"]) == {jnp.dtype("float32")}
    assert all(np.isfinite(float(v)) for v in metrics.values())


def test_bf16_opt_state_first_step_close_to_f32(banks, batch):
    """One step from identical inits: the bf16-moment update must agree with
    the f32 path to ~bf16 quantization (the moments enter through a sqrt, so
    the update error is ~half the 2^-8 storage error)."""
    vgg = random_vgg16_weights()
    results = {}
    for dt in ("float32", "bfloat16"):
        cfg = _cfg(dt)
        state = create_gan_state(cfg, jax.random.PRNGKey(0))
        step = make_gan_train_step(cfg, banks, vgg)
        state, _ = step(state, batch, jax.random.PRNGKey(7))
        results[dt] = state.gen_vars["params"]
    a = jax.tree_util.tree_leaves(results["float32"])
    b = jax.tree_util.tree_leaves(results["bfloat16"])
    for x, y in zip(a, b):
        # Per-parameter movement is <= lr; allow ~1% of lr of divergence.
        assert float(jnp.abs(x - y).max()) < 1e-4 * 0.02


def test_sun_loss_decreases_with_bf16_adam_state(banks, batch):
    cfg = _cfg("bfloat16")
    state = create_sun_state(cfg, jax.random.PRNGKey(0))
    assert _float_dtypes(state.opt) == {jnp.dtype("bfloat16")}
    step = make_sun_train_step(cfg, banks)
    first = last = None
    for _ in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(42))
        if first is None:
            first = float(metrics["sun_total"])
        last = float(metrics["sun_total"])
    assert last < first
    assert _float_dtypes(state.opt) == {jnp.dtype("bfloat16")}


def test_bf16_grad_staging_close_to_f32(banks, batch):
    """grad_dtype='bfloat16': params stay f32 and one step lands within the
    gradient-quantization band of the f32 path; losses stay finite."""
    vgg = random_vgg16_weights()
    results = {}
    for gd in ("float32", "bfloat16"):
        cfg = _cfg("bfloat16", grad_dtype=gd)
        state = create_gan_state(cfg, jax.random.PRNGKey(0))
        step = make_gan_train_step(cfg, banks, vgg)
        state, metrics = step(state, batch, jax.random.PRNGKey(7))
        assert all(np.isfinite(float(v)) for v in metrics.values())
        assert _float_dtypes(state.gen_vars["params"]) == {jnp.dtype("float32")}
        results[gd] = state.gen_vars["params"]
    for x, y in zip(jax.tree_util.tree_leaves(results["float32"]),
                    jax.tree_util.tree_leaves(results["bfloat16"])):
        # RMSprop's first-step update is ~lr * sign-ish(g); bf16 grads shift
        # it by at most ~1% of lr (2^-8 relative through the sqrt).
        assert float(jnp.abs(x - y).max()) < 1e-4 * 0.05


def test_bf16_opt_state_checkpoint_roundtrip(banks, batch, tmp_path):
    """Save/restore preserves the bf16 moment dtypes through the host-side
    abstract-template path (the 64x256 HBM-discipline restore)."""
    from skyhdr.train.checkpoints import CheckpointManager

    cfg = _cfg("bfloat16")
    state = create_gan_state(cfg, jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(tmp_path / "SKY"))
    mgr.save(1, state)
    mgr.close()

    abstract = jax.eval_shape(
        lambda k: create_gan_state(cfg, k), jax.random.PRNGKey(0))
    host = CheckpointManager(str(tmp_path / "SKY")).restore_latest_host(abstract)
    assert host is not None
    assert _float_dtypes((host.opt_gen, host.opt_disc)) == {jnp.dtype("bfloat16")}
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(host.gen_vars["params"])[0]),
        np.asarray(jax.tree_util.tree_leaves(state.gen_vars["params"])[0]))
