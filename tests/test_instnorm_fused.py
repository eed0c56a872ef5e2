"""Fused InstanceNorm(+activation) Pallas kernel (skyhdr/ops/pallas/instnorm.py).

The kernel runs under `interpret=True` here (CPU suite); the TPU-compiled
path is exercised by the e2e drives and benches. What is pinned:

  * value parity vs the plain-XLA composition (the historical
    InstanceNorm-then-activation graph) for all three activation modes and
    both compute dtypes;
  * gradient parity (dx, dgamma, dbeta) of the hand-written custom_vjp vs
    autodiff of the XLA composition;
  * the InstanceNorm module's `act` routing is bit-identical to the old
    leaky_relu_01(InstanceNorm()(x)) / nn.relu(...) composition;
  * the VMEM support gate.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skyhdr.ops.pallas.instnorm import (
    fused_in_supported,
    instance_norm_act,
    instance_norm_act_xla,
)


def _inputs(dtype, c=64, shape=(4, 8, 32)):
    x = jax.random.normal(jax.random.PRNGKey(0), shape + (c,), dtype) * 2 + 0.3
    gamma = jax.random.uniform(jax.random.PRNGKey(1), (c,), jnp.float32, 0.5, 1.5)
    beta = jax.random.normal(jax.random.PRNGKey(2), (c,), jnp.float32) * 0.1
    return x, gamma, beta


@pytest.mark.parametrize("alpha", [1.0, 0.0, 0.1])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_matches_xla(alpha, dtype):
    x, gamma, beta = _inputs(dtype)
    ref = instance_norm_act_xla(x, gamma, beta, alpha=alpha)
    out = instance_norm_act(x, gamma, beta, alpha=alpha,
                            backend="pallas", interpret=True)
    assert out.dtype == x.dtype
    tol = 2e-6 if dtype == jnp.float32 else 2e-3
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=tol)


@pytest.mark.parametrize("alpha", [1.0, 0.0, 0.1])
def test_fused_grads_match_autodiff(alpha):
    x, gamma, beta = _inputs(jnp.float32)

    def loss(fn):
        # sin() makes the cotangent nonuniform so the IN backward's two
        # reduce terms are both exercised.
        return lambda x, g, b: jnp.sum(jnp.sin(fn(x, g, b)))

    ref_fn = loss(lambda x, g, b: instance_norm_act_xla(x, g, b, alpha=alpha))
    fused_fn = loss(lambda x, g, b: instance_norm_act(
        x, g, b, alpha=alpha, backend="pallas", interpret=True))

    g_ref = jax.grad(ref_fn, argnums=(0, 1, 2))(x, gamma, beta)
    g_fused = jax.grad(fused_fn, argnums=(0, 1, 2))(x, gamma, beta)
    for name, a, b in zip(("dx", "dgamma", "dbeta"), g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_module_act_routing_is_bit_identical():
    """InstanceNorm(x, act=...) on the fallback path must equal the
    historical composition EXACTLY (same ops in the same order)."""
    import flax.linen as nn
    from skyhdr.models.layers import InstanceNorm, leaky_relu_01

    x, _, _ = _inputs(jnp.float32, c=16)
    mod = InstanceNorm()
    v = mod.init(jax.random.PRNGKey(0), x)
    plain = mod.apply(v, x)
    assert np.array_equal(np.asarray(mod.apply(v, x, act="lrelu01")),
                          np.asarray(leaky_relu_01(plain)))
    assert np.array_equal(np.asarray(mod.apply(v, x, act="relu")),
                          np.asarray(nn.relu(plain)))


def test_module_fuse_flag_is_noop_on_cpu():
    """fuse=True must fall back (gate off on CPU) with identical results —
    CPU tests and TF-parity oracles see no change from the knob."""
    from skyhdr.models.layers import InstanceNorm

    x, _, _ = _inputs(jnp.float32, c=16)
    a = InstanceNorm(fuse=False)
    b = InstanceNorm(fuse=True)
    v = a.init(jax.random.PRNGKey(0), x)
    assert np.array_equal(np.asarray(a.apply(v, x, act="lrelu01")),
                          np.asarray(b.apply(v, x, act="lrelu01")))


def test_support_gate():
    assert not fused_in_supported((2, 8, 32, 64))  # cpu backend in tests
    # Shape-level constraints: the gate must model the LANE PADDING (c is
    # padded to a multiple of 128 in VMEM) and the backward's ~8-slab live
    # set — the flagship encoder norm1 (32, 128, 32) AOT-failed at 16.43 MB
    # scoped VMEM on the real TPU (BENCH_r04 failed-stage root cause).
    from skyhdr.ops.pallas import instnorm as m

    def fits(h, w, c):
        return (m._padded_slab_bytes(h, w, c) * m._BWD_LIVE_SLABS
                <= m._VMEM_SCOPED_BUDGET)

    assert m._padded_slab_bytes(32, 128, 32) == 32 * 128 * 128 * 4
    assert not fits(32, 128, 32)     # flagship level 1 — the r4 failure
    assert not fits(32, 128, 64)     # flagship level 1 width-64
    assert not fits(64, 256, 64)     # 64x256 level 1
    assert fits(16, 64, 64)          # flagship level 2
    assert fits(8, 32, 128)          # flagship level 3


def test_sharded_backend_grads_under_mesh():
    """backend='sharded' forward+backward on a batch-sharded 8-device mesh
    must match the XLA composition's autodiff (regression for the
    _pallas_bwd_raw factoring: the partition lower_fn needs per-shard
    (B, 1, C) dgamma/dbeta partials, not the summed (C,) values)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    x, gamma, beta = _inputs(jnp.float32, c=16, shape=(8, 8, 32))
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data")))

    def loss(fn):
        return lambda x, g, b: jnp.sum(jnp.sin(fn(x, g, b)))

    ref_fn = loss(lambda x, g, b: instance_norm_act_xla(x, g, b, alpha=0.1))
    sh_fn = loss(lambda x, g, b: instance_norm_act(
        x, g, b, alpha=0.1, backend="sharded"))

    g_ref = jax.grad(ref_fn, argnums=(0, 1, 2))(x, gamma, beta)
    g_sh = jax.jit(jax.grad(sh_fn, argnums=(0, 1, 2)))(x_sh, gamma, beta)
    for name, a, b in zip(("dx", "dgamma", "dbeta"), g_ref, g_sh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_mesh_cfg_disables_fused_in():
    from skyhdr.config import Config, ModelConfig
    from skyhdr.parallel.dp import _mesh_cfg

    # Default OFF since the r5 TPU measurement (see ModelConfig docstring).
    assert Config().model.fused_instance_norm is False
    # An explicit opt-in must still be forced off under GSPMD meshes.
    cfg = Config(model=ModelConfig(fused_instance_norm=True))
    assert _mesh_cfg(cfg).model.fused_instance_norm is False
    assert _mesh_cfg(cfg, shard_width=True).model.fused_instance_norm is False
