"""bf16 stored params with an f32 master (TrainConfig.param_dtype).

The forward/backward stream bf16 params from HBM (at 64x256 the 3.2 GB
sunpose FCs, reference sunpose_net.py:36, dominate the stream) while the
optimizer accumulates into an f32 MASTER kept in its state
(engine._with_param_master). Invariants tested here:
  * stored params are exactly round_bf16(master) after every step (the
    emitted-update construction is exact in f32);
  * the master tracks the plain-f32 training path to within the
    bf16-forward gradient-perturbation band;
  * the SUN->GAN handoff refreshes BOTH the stored copy and the master;
  * checkpoints round-trip the MasterParamsState structure, and the
    serving restore falls back across param_dtype template structures.
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
from skyhdr.train.engine import MasterParamsState, replace_sun_params
from skyhdr.utils.io import get_exposure_lists, make_synthetic_dorf


def _cfg(param_dtype, **train_kw):
    return Config(
        model=ModelConfig(im_height=16, im_width=64),
        data=DataConfig(batch_size=4),
        train=TrainConfig(learning_rate=1e-4, param_dtype=param_dtype,
                          **train_kw),
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


def test_bf16_param_state_structure(banks, batch):
    cfg = _cfg("bfloat16")
    state = create_gan_state(cfg, jax.random.PRNGKey(0))
    # Stored params are bf16; batch_stats stay f32.
    assert _float_dtypes(state.gen_vars["params"]) == {jnp.dtype("bfloat16")}
    assert _float_dtypes(state.sun_vars["params"]) == {jnp.dtype("bfloat16")}
    assert _float_dtypes(state.gen_vars["batch_stats"]) == {jnp.dtype("float32")}
    # Master lives in the opt state, at f32, matching the param structure.
    assert isinstance(state.opt_gen, MasterParamsState)
    assert _float_dtypes(state.opt_gen.master) == {jnp.dtype("float32")}
    gm, sm = state.opt_gen.master
    assert (jax.tree_util.tree_structure(gm)
            == jax.tree_util.tree_structure(state.gen_vars["params"]))

    step = make_gan_train_step(cfg, banks, random_vgg16_weights())
    state, metrics = step(state, batch, jax.random.PRNGKey(7))
    assert all(np.isfinite(float(v)) for v in metrics.values())
    assert _float_dtypes(state.gen_vars["params"]) == {jnp.dtype("bfloat16")}


def test_params_exactly_round_bf16_of_master(banks, batch):
    """apply_updates(params_bf16, emitted) must land EXACTLY on
    round_bf16(master): both operands of the f32 arithmetic are
    bf16-representable, so no drift accumulates between the stored copy
    and the master."""
    cfg = _cfg("bfloat16")
    state = create_gan_state(cfg, jax.random.PRNGKey(0))
    step = make_gan_train_step(cfg, banks, random_vgg16_weights())
    for i in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    gen_master, sun_master = state.opt_gen.master
    for stored, master in (
        (state.gen_vars["params"], gen_master),
        (state.sun_vars["params"], sun_master),
        (state.disc_vars["params"], state.opt_disc.master),
    ):
        for p, m in zip(jax.tree_util.tree_leaves(stored),
                        jax.tree_util.tree_leaves(master)):
            # XLA's in-graph fusion may reassociate the exact construction
            # by <=1 bf16 ULP on isolated elements (observed: 1/128 elems at
            # 2e-16 abs on CPU); the invariant re-derives from the master
            # every step, so this cannot accumulate. Bitwise equality of the
            # mechanics themselves is asserted eagerly in
            # test_with_param_master_matches_inner_tx.
            np.testing.assert_allclose(
                np.asarray(p, dtype=np.float32),
                np.asarray(m.astype(jnp.bfloat16), dtype=np.float32),
                rtol=1.0 / 256, atol=1e-12)


def test_with_param_master_matches_inner_tx():
    """The master mechanics, isolated from any model: on identical gradient
    sequences, _with_param_master's f32 master must track the plain inner tx
    applied to f32 params BITWISE (it executes the same tx.update +
    apply_updates on the same f32 values, eagerly here so both paths run the
    same op sequence), and the stored bf16 copy must equal
    round_bf16(master) exactly.

    NB full-model one-step comparisons across param_dtype are deliberately
    NOT asserted: optax.rmsprop adds eps OUTSIDE the sqrt, so a near-zero
    gradient already yields a full-scale +-3.16*lr update — any two
    differently-compiled graphs (the bf16 one carries extra casts) flip
    such signs on compilation-level noise. Observed before this test
    replaced that design: 62% sign flips on a zero-init bias leaf."""
    import optax

    from skyhdr.train.engine import _with_param_master

    tx = optax.rmsprop(1e-4, decay=0.9, eps=1e-7)
    wrapped = _with_param_master(tx, "bfloat16")

    rng = np.random.default_rng(3)
    params32 = {
        "w": jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32)),
        "b": jnp.zeros((8,), jnp.float32),
    }
    params16 = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16),
                                      params32)
    state = wrapped.init(params32)
    ref_state = tx.init(params32)
    ref_params = params32

    for i in range(5):
        grads = jax.tree_util.tree_map(
            lambda x: jnp.asarray(
                rng.standard_normal(x.shape).astype(np.float32)) * 0.1,
            params32)
        u, state = wrapped.update(grads, state, params16)
        params16 = optax.apply_updates(params16, u)
        ru, ref_state = tx.update(grads, ref_state, ref_params)
        ref_params = optax.apply_updates(ref_params, ru)

        for m, r in zip(jax.tree_util.tree_leaves(state.master),
                        jax.tree_util.tree_leaves(ref_params)):
            np.testing.assert_array_equal(np.asarray(m), np.asarray(r))
        for p, m in zip(jax.tree_util.tree_leaves(params16),
                        jax.tree_util.tree_leaves(state.master)):
            np.testing.assert_array_equal(
                np.asarray(p), np.asarray(m.astype(jnp.bfloat16)))


def test_sun_pretrain_bf16_params_learns(banks, batch):
    cfg = _cfg("bfloat16")
    state = create_sun_state(cfg, jax.random.PRNGKey(0))
    assert _float_dtypes(state.sun_vars["params"]) == {jnp.dtype("bfloat16")}
    assert isinstance(state.opt, MasterParamsState)
    step = make_sun_train_step(cfg, banks)
    first = last = None
    for _ in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(42))
        if first is None:
            first = float(metrics["sun_total"])
        last = float(metrics["sun_total"])
    assert last < first


def test_handoff_refreshes_master(banks):
    """replace_sun_params must update BOTH the stored bf16 copy and the f32
    master — otherwise the first optimizer step reverts the handoff to the
    fresh-init master."""
    cfg = _cfg("bfloat16")
    state = create_gan_state(cfg, jax.random.PRNGKey(0))
    donor = create_sun_state(_cfg("float32"), jax.random.PRNGKey(99))
    state = replace_sun_params(cfg, state, donor.sun_vars["params"])

    _, sun_master = state.opt_gen.master
    for d, m, p in zip(jax.tree_util.tree_leaves(donor.sun_vars["params"]),
                       jax.tree_util.tree_leaves(sun_master),
                       jax.tree_util.tree_leaves(state.sun_vars["params"])):
        np.testing.assert_array_equal(np.asarray(d), np.asarray(m))
        np.testing.assert_array_equal(np.asarray(p),
                                      np.asarray(m.astype(jnp.bfloat16)))


def test_handoff_f32_passthrough(banks):
    cfg = _cfg("float32")
    state = create_gan_state(cfg, jax.random.PRNGKey(0))
    donor = create_sun_state(_cfg("float32"), jax.random.PRNGKey(99))
    state = replace_sun_params(cfg, state, donor.sun_vars["params"])
    for d, p in zip(jax.tree_util.tree_leaves(donor.sun_vars["params"]),
                    jax.tree_util.tree_leaves(state.sun_vars["params"])):
        np.testing.assert_array_equal(np.asarray(d), np.asarray(p))


def test_ckpt_roundtrip_and_cross_dtype_serving_restore(banks, batch,
                                                        tmp_path):
    """A bf16-param checkpoint round-trips its MasterParamsState, and the
    serving restore (restore_model_vars) finds the right template even when
    the CLI was not passed --param-dtype (structure fallback)."""
    from skyhdr.cli.common import restore_model_vars
    from skyhdr.train.checkpoints import CheckpointManager

    cfg = _cfg("bfloat16")
    state = create_gan_state(cfg, jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(tmp_path / "checkpoints" / "SKY"))
    mgr.save(1, state)
    mgr.close()

    abstract = jax.eval_shape(lambda k: create_gan_state(cfg, k),
                              jax.random.PRNGKey(0))
    host = CheckpointManager(
        str(tmp_path / "checkpoints" / "SKY")).restore_latest_host(abstract)
    assert host is not None
    assert isinstance(host.opt_gen, MasterParamsState)
    assert _float_dtypes(host.gen_vars["params"]) == {jnp.dtype("bfloat16")}

    # Serving restore configured WITHOUT the knob (the default f32 cfg):
    # must fall back to the bf16-param template structure and succeed.
    serve_cfg = _cfg("float32")
    gen_vars, sun_vars = restore_model_vars(serve_cfg, str(tmp_path),
                                            log=lambda *a, **k: None)
    assert gen_vars is not None and sun_vars is not None
    for a, b in zip(jax.tree_util.tree_leaves(gen_vars["params"]),
                    jax.tree_util.tree_leaves(state.gen_vars["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
