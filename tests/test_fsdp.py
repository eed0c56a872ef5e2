"""FSDP (ZeRO-3 sharded state) tests on the virtual 8-CPU mesh.

The capability under test: skyhdr.parallel.fsdp shards every large train
state leaf over the `data` axis (the 64x256 configs' 3.2 GB sunpose FCs are
the motivating case), while the step itself stays the unmodified engine
step — GSPMD inserts the all-gather/reduce-scatter collectives.
"""

import numpy as np
import jax
import jax.numpy as jnp

from skyhdr.config import Config, DataConfig, ModelConfig, TrainConfig
from skyhdr.data.degradation import DegradationBanks
from skyhdr.data.pipeline import synthetic_dataset
from skyhdr.models.vgg16 import random_vgg16_weights
from skyhdr.parallel.fsdp import (
    fsdp_state_sharding,
    make_fsdp_gan_train_step,
    make_fsdp_sun_train_step,
)
from skyhdr.parallel.mesh import make_mesh
from skyhdr.train.engine import (
    create_gan_state,
    create_sun_state,
    make_gan_train_step,
    make_sun_train_step,
)
from skyhdr.utils.io import get_exposure_lists, make_synthetic_dorf


def _banks():
    return DegradationBanks(
        crfs=jnp.asarray(make_synthetic_dorf(8, 256)),
        exposures=jnp.asarray(get_exposure_lists()[1]),
    )


def _cfg(batch=8):
    return Config(model=ModelConfig(im_height=16, im_width=64),
                  data=DataConfig(batch_size=batch),
                  train=TrainConfig(learning_rate=1e-3))


def _batch(cfg):
    ds = synthetic_dataset(cfg.data.batch_size, imshape=cfg.model.imshape,
                           batch_size=cfg.data.batch_size)
    raw = next(iter(ds))
    return {"hdr": jnp.asarray(raw["hdr"]),
            "elevation": jnp.asarray(raw["elevation"])}


def test_sharding_plan_splits_big_leaves_only():
    cfg = _cfg()
    mesh = make_mesh()
    abstract = jax.eval_shape(lambda k: create_gan_state(cfg, k),
                              jax.random.PRNGKey(0))
    sh = fsdp_state_sharding(abstract, mesh)

    leaves = list(zip(jax.tree_util.tree_leaves(abstract),
                      jax.tree_util.tree_leaves(sh)))
    sharded = [(l, s) for l, s in leaves
               if any(a == "data" for a in s.spec)]
    # The h*w-wide sunpose FC kernels (1024x1024 f32 = 4 MB at 16x64) and
    # their optimizer moments must be sharded; scalars/biases replicated.
    assert len(sharded) >= 4, f"expected FC params+moments sharded, got {sharded}"
    for leaf, s in leaves:
        nbytes = int(np.prod(leaf.shape)) * np.dtype(leaf.dtype).itemsize
        if any(a == "data" for a in s.spec):
            assert nbytes >= 1 << 20
            d = list(s.spec).index("data")
            assert leaf.shape[d] % mesh.shape["data"] == 0
        elif nbytes >= 1 << 20:
            # big but replicated => no dim divisible by the mesh
            assert all(dim % mesh.shape["data"] != 0 or dim < 8
                       for dim in leaf.shape), (leaf.shape, s.spec)


def test_fsdp_state_residency_is_sharded():
    cfg = _cfg()
    mesh = make_mesh()
    banks = _banks()
    _, shard_state, _ = make_fsdp_gan_train_step(
        cfg, banks, random_vgg16_weights(), mesh)
    state = shard_state(create_gan_state(cfg, jax.random.PRNGKey(0)))
    fc = state.sun_vars["params"]["fc1"]["kernel"]
    n = mesh.shape["data"]
    assert fc.sharding.is_fully_replicated is False
    shard = fc.addressable_shards[0].data
    assert shard.size * n == fc.size, (shard.shape, fc.shape)


def test_fsdp_gan_step_matches_single_device():
    """Same batch, same key: FSDP and single-device steps must agree —
    the sharding annotations change layout, not math (all-gathered
    parameters are bit-identical; only reduction order may wiggle)."""
    cfg = _cfg()
    banks = _banks()
    vgg = random_vgg16_weights()
    batch = _batch(cfg)
    key = jax.random.PRNGKey(7)

    single = make_gan_train_step(cfg, banks, vgg)
    s1, m1 = single(create_gan_state(cfg, jax.random.PRNGKey(0)), batch, key)

    mesh = make_mesh()
    step, shard_state, shard_batch = make_fsdp_gan_train_step(
        cfg, banks, vgg, mesh)
    s2 = shard_state(create_gan_state(cfg, jax.random.PRNGKey(0)))
    s2, m2 = step(s2, shard_batch(batch), key)

    for k in ("gen_total", "disc_total", "l1", "kl"):
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-3,
                                   err_msg=k)

    # Second step (functional equivalence after one update; see
    # test_parallel.py for why parameter-level equality is not asserted).
    s1, m1b = single(s1, batch, jax.random.PRNGKey(8))
    s2, m2b = step(s2, shard_batch(batch), jax.random.PRNGKey(8))
    np.testing.assert_allclose(float(m1b["gen_total"]), float(m2b["gen_total"]),
                               rtol=5e-2)


def test_fsdp_sun_step_matches_single_device():
    cfg = _cfg()
    banks = _banks()
    batch = _batch(cfg)
    key = jax.random.PRNGKey(11)

    single = make_sun_train_step(cfg, banks)
    _, m1 = single(create_sun_state(cfg, jax.random.PRNGKey(0)), batch, key)

    mesh = make_mesh()
    step, shard_state, shard_batch = make_fsdp_sun_train_step(cfg, banks, mesh)
    s2 = shard_state(create_sun_state(cfg, jax.random.PRNGKey(0)))
    _, m2 = step(s2, shard_batch(batch), key)

    np.testing.assert_allclose(float(m1["sun_total"]), float(m2["sun_total"]),
                               rtol=1e-4)


def test_fsdp_composes_with_width_sharding():
    """FSDP state + dp x width batch sharding on a 4x2 mesh — the full
    scale-out layout for 64x256+ configs. Metrics must MATCH the
    single-device step, not merely be finite: the combined
    (data>=2, width>=2) layout is exactly where XLA miscompiled the
    width-folded decoder convs (wrong l1/adv with finite kl — see
    ops/foldconv.py sharding caveat; _mesh_cfg now routes the fold off)."""
    cfg = _cfg()
    banks = _banks()
    vgg = random_vgg16_weights()
    batch = _batch(cfg)
    key = jax.random.PRNGKey(1)

    single = make_gan_train_step(cfg, banks, vgg)
    _, m1 = single(create_gan_state(cfg, jax.random.PRNGKey(0)), batch, key)

    mesh = make_mesh(data=4, width=2)
    step, shard_state, shard_batch = make_fsdp_gan_train_step(
        cfg, banks, vgg, mesh, shard_width=True)
    state = shard_state(create_gan_state(cfg, jax.random.PRNGKey(0)))
    state, m2 = step(state, shard_batch(batch), key)

    for k in ("gen_total", "adv", "l1", "disc_total", "kl"):
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-3,
                                   err_msg=k)
    assert int(state.step) == 1


def test_mesh_cfg_disables_fold_under_width_sharding():
    from skyhdr.parallel.dp import _mesh_cfg
    cfg = _cfg()
    assert cfg.model.fold_tiny_convs is True
    assert _mesh_cfg(cfg, shard_width=False).model.fold_tiny_convs is True
    assert _mesh_cfg(cfg, shard_width=True).model.fold_tiny_convs is False


def test_no_involuntary_remat_in_spmd_compile(capfd):
    """VERDICT r4 item 4: the dp x width FSDP layout must compile with NO
    'Involuntary full rematerialization' warning from the SPMD partitioner.
    The r4 dryrun replicated a SunPoseNet fc1 tensor every step — fixed by
    (a) SpatialDense computing fc1 as einsum('bhwc,hwcd->bd') instead of
    flatten-then-Dense (the flatten of a width-sharded activation cannot be
    partitioned) and (b) FSDP sharding the fc kernels on their OUTPUT dim
    (a dim-0 sharding shatters across (h, w, c) in the kernel reshape and
    poisons the Grad-CAM second-order dX dot)."""
    cfg = _cfg(batch=16)
    banks = _banks()
    vgg = random_vgg16_weights()
    batch = _batch(cfg)

    mesh = make_mesh(data=2, width=4)
    step, shard_state, shard_batch = make_fsdp_gan_train_step(
        cfg, banks, vgg, mesh, shard_width=True)
    state = shard_state(create_gan_state(cfg, jax.random.PRNGKey(0)))
    capfd.readouterr()  # drop anything emitted before the compile of record
    state, m = step(state, shard_batch(batch), jax.random.PRNGKey(3))
    jax.block_until_ready(m)
    err = capfd.readouterr().err
    assert "Involuntary full rematerialization" not in err, err[-2000:]
