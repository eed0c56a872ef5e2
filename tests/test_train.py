"""Single-step train tests on synthetic data: finite losses, parameter
updates, correct update topology (SURVEY.md §4.3)."""

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
    make_gan_eval_step,
    make_gan_train_step,
    make_inference_fn,
    make_sun_eval_step,
    make_sun_train_step,
)
from skyhdr.train.losses import kl_divergence
from skyhdr.utils.io import get_exposure_lists, make_synthetic_dorf


@pytest.fixture(scope="module")
def cfg():
    return Config(
        model=ModelConfig(im_height=16, im_width=64),
        data=DataConfig(batch_size=4),
        train=TrainConfig(learning_rate=1e-4),
    )


@pytest.fixture(scope="module")
def banks():
    return DegradationBanks(
        crfs=jnp.asarray(make_synthetic_dorf(8, 256)),
        exposures=jnp.asarray(get_exposure_lists()[1]),
    )


@pytest.fixture(scope="module")
def batch(cfg):
    ds = synthetic_dataset(cfg.data.batch_size, imshape=cfg.model.imshape,
                           batch_size=cfg.data.batch_size)
    b = next(iter(ds))
    return {"hdr": jnp.asarray(b["hdr"]), "elevation": jnp.asarray(b["elevation"])}


def _tree_max_abs_diff(a, b):
    diffs = jax.tree_util.tree_map(
        lambda x, y: float(jnp.abs(x - y).max()), a, b
    )
    return max(jax.tree_util.tree_leaves(diffs))


def test_kl_divergence_keras_semantics():
    gt = np.zeros((2, 10), np.float32)
    gt[:, 3] = 1.0
    pred = np.full((2, 10), 0.1, np.float32)
    got = float(kl_divergence(jnp.asarray(gt), jnp.asarray(pred)))
    eps = 1e-7
    t = np.clip(gt, eps, 1)
    p = np.clip(pred, eps, 1)
    expected = np.mean(np.sum(t * np.log(t / p), -1))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_gan_train_step(cfg, banks, batch):
    state = create_gan_state(cfg, jax.random.PRNGKey(0))
    step = make_gan_train_step(cfg, banks, random_vgg16_weights())

    prev_gen = jax.tree_util.tree_map(jnp.copy, state.gen_vars["params"])
    prev_sun = jax.tree_util.tree_map(jnp.copy, state.sun_vars["params"])
    prev_disc = jax.tree_util.tree_map(jnp.copy, state.disc_vars["params"])
    prev_disc_bs = jax.tree_util.tree_map(jnp.copy, state.disc_vars["batch_stats"])

    state2, metrics = step(state, batch, jax.random.PRNGKey(1))

    for name, value in metrics.items():
        assert bool(jnp.isfinite(value)), name
    assert int(state2.step) == 1
    # Generator AND sun net both updated by the joint RMSprop step
    # (train.py:402-403); discriminator updated separately; disc BN running
    # stats refreshed by the two training forwards (train.py:360-361).
    assert _tree_max_abs_diff(state2.gen_vars["params"], prev_gen) > 0
    assert _tree_max_abs_diff(state2.sun_vars["params"], prev_sun) > 0
    assert _tree_max_abs_diff(state2.disc_vars["params"], prev_disc) > 0
    assert _tree_max_abs_diff(state2.disc_vars["batch_stats"], prev_disc_bs) > 0

    # Second step keeps everything finite.
    state3, metrics3 = step(state2, batch, jax.random.PRNGKey(2))
    for name, value in metrics3.items():
        assert bool(jnp.isfinite(value)), name


def test_gan_eval_step(cfg, banks, batch):
    state = create_gan_state(cfg, jax.random.PRNGKey(0))
    eval_step = make_gan_eval_step(cfg, banks, random_vgg16_weights())
    metrics, outputs = eval_step(state, batch, jax.random.PRNGKey(1))
    for name, value in metrics.items():
        assert bool(jnp.isfinite(value)), name
    b, h, w, c = (cfg.data.batch_size, *cfg.model.imshape)
    assert outputs["y_final_lin"].shape == (b, h, w, c)
    assert float(outputs["y_final_lin"].min()) >= 0.0
    assert outputs["sunpose_pred"].shape == (b, h, w, 1)


def test_sun_train_and_eval_step(cfg, banks, batch):
    state = create_sun_state(cfg, jax.random.PRNGKey(0))
    step = make_sun_train_step(cfg, banks)
    prev = jax.tree_util.tree_map(jnp.copy, state.sun_vars["params"])
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert bool(jnp.isfinite(metrics["sun_total"]))
    assert _tree_max_abs_diff(state2.sun_vars["params"], prev) > 0

    eval_step = make_sun_eval_step(cfg, banks)
    metrics2, outputs = eval_step(state2, batch, jax.random.PRNGKey(2))
    assert bool(jnp.isfinite(metrics2["sun_total"]))
    assert outputs["pred"].shape == (cfg.data.batch_size, cfg.model.im_height,
                                     cfg.model.im_width, 1)


def test_sun_loss_decreases_over_steps(cfg, banks, batch):
    """Optimization sanity: a few Adam steps on a fixed batch must reduce
    the sun-pose loss."""
    state = create_sun_state(cfg, jax.random.PRNGKey(0))
    step = make_sun_train_step(cfg, banks)
    first = None
    last = None
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(42))
        if first is None:
            first = float(metrics["sun_total"])
        last = float(metrics["sun_total"])
    assert last < first


def test_inference_fn(cfg, batch):
    state = create_gan_state(cfg, jax.random.PRNGKey(0))
    infer = make_inference_fn(cfg)
    ldr = jnp.clip(batch["hdr"], 0, 1)
    out = infer(state.gen_vars, state.sun_vars, ldr)
    assert out["y_final_lin"].shape == ldr.shape
    assert bool(jnp.all(jnp.isfinite(out["y_final_lin"])))
    assert float(out["alpha"].min()) >= 0.0 and float(out["alpha"].max()) <= 1.0


def test_sigma_scales_honored_in_eval_and_sun_steps(cfg, banks, batch):
    """Regression (round-1 review): eval and sun steps used to drop
    DataConfig.sigma_{s,c}_scale, so non-default noise settings applied to
    the GAN train step only. Changing the scales must change every step's
    degraded input (observable through the metrics)."""
    import dataclasses
    noisy_cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, sigma_s_scale=2.0, sigma_c_scale=1.0)
    )
    key = jax.random.PRNGKey(7)

    gstate = create_gan_state(cfg, jax.random.PRNGKey(0))
    vgg = random_vgg16_weights()
    base_m, _ = make_gan_eval_step(cfg, banks, vgg)(gstate, batch, key)
    noisy_m, _ = make_gan_eval_step(noisy_cfg, banks, vgg)(gstate, batch, key)
    assert float(base_m["l1"]) != float(noisy_m["l1"])

    sstate = create_sun_state(cfg, jax.random.PRNGKey(0))
    base_s, _ = make_sun_eval_step(cfg, banks)(sstate, batch, key)
    noisy_s, _ = make_sun_eval_step(noisy_cfg, banks)(sstate, batch, key)
    assert float(base_s["kl"]) != float(noisy_s["kl"])

    _, strain_b = make_sun_train_step(cfg, banks)(
        create_sun_state(cfg, jax.random.PRNGKey(0)), batch, key)
    _, strain_n = make_sun_train_step(noisy_cfg, banks)(
        create_sun_state(cfg, jax.random.PRNGKey(0)), batch, key)
    assert float(strain_b["kl"]) != float(strain_n["kl"])
