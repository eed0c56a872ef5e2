"""Fused InstanceNorm(+activation) Pallas kernel.

Motivation (profiler, 2026-08-19, tools/profile_train.py on the flagship
bf16 b128 GAN step): the step's device time is dominated by ELEMENTWISE
traffic — ~12 ms of loop fusions around the convs, of which the
InstanceNorm moment reduces alone are ~3.2 ms (`convert_reduce_fusion`
n=24) and the normalize+activation fusions most of the rest. XLA compiles
each IN as (a) a multi-output mean/var reduce pass over x and (b) a
normalize+activation pass reading x again — 3 HBM passes forward (2 reads
+ 1 write), and ~5 passes backward across the dgamma/dbeta reduces and the
dx fusion. The tensors are small enough that a whole per-sample (H, W, C)
slab fits VMEM, so one kernel instance per sample can do the moments AND
the normalize in a single read: 2 passes forward (read x, write y), 3
backward (read x, read dy, write dx) with the (B, C) moments stashed from
the forward.

The activation is fused in as a static leaky-relu slope `alpha`:
  alpha=1.0  -> identity            (resblock norm2)
  alpha=0.0  -> relu                (sunpose stages, reference
                                     sunpose_net.py:23-24)
  alpha=0.1  -> leaky_relu(0.1)     (generator trunk, reference
                                     generator.py:24,98-107)
matching exactly how the unfused graph applies nn.relu / leaky_relu_01 to
the InstanceNorm OUTPUT (i.e. after the cast back to the compute dtype —
the mask and the slope multiply act on the cast value, so the fused path
is bit-compatible with the unfused one in bf16 as well).

Reference semantics mirrored: tfa.layers.InstanceNormalization with
epsilon=1e-3 (skyhdr.models.layers.InstanceNorm; statistics in f32 even
under bf16 compute).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the support gate. Two hard-won facts (2026-08-19, real
# TPU — the r4 driver-bench failure):
#   * the channel axis is LANE-PADDED to a multiple of 128 in VMEM, so a
#     c=32 slab occupies 4x its logical bytes;
#   * the BACKWARD kernel holds ~8 live f32 slabs at once (xf, dyf, xhat,
#     ypre, dxhat and the dx/partial outputs plus fusion temps): the
#     flagship encoder norm1 at (128, 32, 128, 32) AOT-compiled to a
#     16.43 MB scoped allocation against the 16.00 MB limit and FAILED.
# Gate on padded-slab * live-set <= 14 MB (headroom under the 16 MB limit).
_BWD_LIVE_SLABS = 8
_VMEM_SCOPED_BUDGET = 14 << 20


def _padded_slab_bytes(h: int, w: int, c: int) -> int:
    c_pad = -(-c // 128) * 128
    return h * w * c_pad * 4


def _shape_supported(x_shape) -> bool:
    """Per-sample slab (lane-padded) x backward live-set fits VMEM
    (backend-independent — batch sharding does not change the per-sample
    (H, W, C) slab)."""
    if len(x_shape) != 4:
        return False
    b, h, w, c = x_shape
    return (_padded_slab_bytes(h, w, c) * _BWD_LIVE_SLABS
            <= _VMEM_SCOPED_BUDGET and w >= 8)


def fused_in_supported(x_shape) -> bool:
    """True when the direct Pallas path can serve this shape here."""
    return jax.default_backend() != "cpu" and _shape_supported(x_shape)


def _act(y, alpha: float):
    """Activation on the CAST output, exactly like the unfused graph:
    nn.leaky_relu(y, alpha) = where(y >= 0, y, alpha*y); alpha=0 is relu,
    alpha=1 is identity."""
    if alpha == 1.0:
        return y
    return jnp.where(y >= 0, y, (alpha * y).astype(y.dtype))


def instance_norm_act_xla(x, gamma, beta, *, eps: float = 1e-3,
                          alpha: float = 1.0):
    """Plain-XLA reference path — bit-identical to the historical
    InstanceNorm-then-activation composition (models/layers.py:39-54)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(-3, -2), keepdims=True)
    var = jnp.var(xf, axis=(-3, -2), keepdims=True)
    y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    y = (y * gamma + beta).astype(x.dtype)
    return _act(y, alpha)


# ---------------------------------------------------------------------------
# Pallas kernels: grid over the batch; one (H, W, C) slab per instance.
# ---------------------------------------------------------------------------


def _fwd_kernel(eps, alpha, x_ref, g_ref, b_ref, y_ref, mean_ref, rstd_ref):
    xf = x_ref[0].astype(jnp.float32)                      # (H, W, C)
    mean = jnp.mean(xf, axis=(0, 1), keepdims=True)        # (1, 1, C)
    var = jnp.mean(jnp.square(xf - mean), axis=(0, 1), keepdims=True)
    rstd = jnp.reciprocal(jnp.sqrt(var + eps))
    yf = (xf - mean) * rstd * g_ref[0][None] + b_ref[0][None]
    y = yf.astype(y_ref.dtype)
    if alpha != 1.0:
        # Mask from the f32 pre-activation: Mosaic on this target cannot
        # compile bf16 vector comparisons ("Target does not support this
        # comparison"). Value-identical to masking the cast output — the
        # cast preserves sign except where y rounds to +-0, and there both
        # branches yield +-0.
        y = jnp.where(yf >= 0, y, (alpha * y).astype(y.dtype))
    y_ref[0] = y
    mean_ref[0] = mean[0]
    rstd_ref[0] = rstd[0]


def _bwd_kernel(alpha, x_ref, dy_ref, g_ref, b_ref, mean_ref, rstd_ref,
                dx_ref, dg_ref, db_ref):
    xf = x_ref[0].astype(jnp.float32)
    mean = mean_ref[0][None]                               # (1, 1, C)
    rstd = rstd_ref[0][None]
    g = g_ref[0][None]
    xhat = (xf - mean) * rstd
    # Activation mask recomputed from the f32 pre-activation (bf16 vector
    # compares don't compile on this target; sign-of-zero is the only
    # divergence from masking the cast value — measure-zero for training).
    ypre = xhat * g + b_ref[0][None]
    dyf = dy_ref[0].astype(jnp.float32)
    if alpha != 1.0:
        dyf = jnp.where(ypre >= 0, dyf, alpha * dyf)
    # d/d(gamma, beta): per-sample partials, summed over the batch outside.
    db_ref[0] = jnp.sum(dyf, axis=(0, 1), keepdims=True)[0]
    dg_ref[0] = jnp.sum(dyf * xhat, axis=(0, 1), keepdims=True)[0]
    # Standard instance-norm backward (per (sample, channel), N = H*W):
    #   dx = rstd * (dxhat - E[dxhat] - xhat * E[dxhat * xhat])
    dxhat = dyf * g
    m1 = jnp.mean(dxhat, axis=(0, 1), keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=(0, 1), keepdims=True)
    dx_ref[0] = (rstd * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)


def _pallas_fwd(x, gamma, beta, eps: float, alpha: float,
                interpret: bool = False):
    b, h, w, c = x.shape
    g2 = gamma.astype(jnp.float32).reshape(1, c)
    b2 = beta.astype(jnp.float32).reshape(1, c)
    y, mean, rstd = pl.pallas_call(
        partial(_fwd_kernel, eps, alpha),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            # (B, 1, C), not (B, C): a (1, C) block of a (B, C) array fails
            # Mosaic's block-shape rule for C not divisible by 128; with the
            # singleton axis the block's last two dims EQUAL the array's.
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ],
        interpret=interpret,
    )(x, g2, b2)
    return y, mean, rstd


def _pallas_bwd_raw(x, dy, g2, b2, mean, rstd, alpha: float,
                    interpret: bool = False):
    """Backward kernel returning PER-SAMPLE (B, 1, C) dgamma/dbeta partials.

    g2/b2 must already be f32 (1, C). The sharded backend's partition
    lower_fn calls this directly: under a batch-sharded mesh each shard
    must emit its own (B_shard, 1, C) partials, with the batch sum (and
    its GSPMD psum) happening OUTSIDE the wrapped op."""
    b, h, w, c = x.shape
    dx, dg_part, db_part = pl.pallas_call(
        partial(_bwd_kernel, alpha),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ],
        interpret=interpret,
    )(x, dy, g2, b2, mean, rstd)
    return dx, dg_part, db_part


def _pallas_bwd(x, dy, gamma, beta, mean, rstd, alpha: float,
                interpret: bool = False):
    g2 = gamma.astype(jnp.float32).reshape(1, -1)
    b2 = beta.astype(jnp.float32).reshape(1, -1)
    dx, dg_part, db_part = _pallas_bwd_raw(x, dy, g2, b2, mean, rstd, alpha,
                                           interpret)
    dgamma = jnp.sum(dg_part, axis=(0, 1)).astype(gamma.dtype)
    dbeta = jnp.sum(db_part, axis=(0, 1)).astype(beta.dtype)
    return dx, dgamma, dbeta


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused(x, gamma, beta, eps: float, alpha: float, interpret: bool):
    y, _, _ = _pallas_fwd(x, gamma, beta, eps, alpha, interpret)
    return y


def _fused_fwd(x, gamma, beta, eps, alpha, interpret):
    y, mean, rstd = _pallas_fwd(x, gamma, beta, eps, alpha, interpret)
    return y, (x, gamma, beta, mean, rstd)


def _fused_bwd(eps, alpha, interpret, res, dy):
    x, gamma, beta, mean, rstd = res
    dx, dgamma, dbeta = _pallas_bwd(x, dy, gamma, beta, mean, rstd, alpha,
                                    interpret)
    return dx, dgamma, dbeta


_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# GSPMD-partitionable wrappers: a bare pallas_call inside a sharded jit is an
# opaque custom call the SPMD partitioner would replicate (all-gathering the
# batch onto every device). The op is trivially data-parallel, so
# custom_partitioning teaches the partitioner exactly that — same recipe as
# skyhdr.ops.pallas.sharded for the DA conv. The dgamma/dbeta batch partials
# stay per-shard (B, 1, C) outputs; the jnp.sum over the batch axis happens
# OUTSIDE the wrapped op, where GSPMD natively turns it into a psum.
# Off-TPU shards run the kernels under the pure-JAX Pallas interpreter,
# which is how the 8-virtual-device CPU tests drive the real kernel logic.
# ---------------------------------------------------------------------------

from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def _interpret_here() -> bool:
    return jax.default_backend() != "tpu"


def _batch_spec(sharding):
    spec = getattr(sharding, "spec", None)
    if not spec:
        return None
    return spec[0]


@partial(custom_partitioning, static_argnums=(3, 4))
def _fwd_cp(x, g2, b2, eps, alpha):
    # Semantics body (const-free): identical math to _fwd_kernel.
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    rstd = jnp.reciprocal(jnp.sqrt(var + eps))
    yf = (xf - mean) * rstd * g2[0] + b2[0]
    y = yf.astype(x.dtype)
    if alpha != 1.0:
        y = jnp.where(yf >= 0, y, (alpha * y).astype(y.dtype))
    return y, mean[:, 0], rstd[:, 0]


def _fwd_cp_partition(eps, alpha, mesh, arg_shapes, result_shape):
    bspec = _batch_spec(arg_shapes[0].sharding)
    rep = NamedSharding(mesh, P())
    shd4 = NamedSharding(mesh, P(bspec, None, None, None))
    shd3 = NamedSharding(mesh, P(bspec, None, None))

    def lower_fn(xl, gl, bl):
        return _pallas_fwd(xl, gl, bl, eps, alpha,
                           interpret=_interpret_here())

    return mesh, lower_fn, (shd4, shd3, shd3), (shd4, rep, rep)


_fwd_cp.def_partition(
    _fwd_cp_partition,
    sharding_rule="b h w c, i c, i c -> b h w c, b i c, b i c",
    need_replication_factors=("h", "w", "c", "i"),
)


@partial(custom_partitioning, static_argnums=(6,))
def _bwd_cp(x, dy, g2, b2, mean, rstd, alpha):
    xf = x.astype(jnp.float32)
    m = mean[:, :, None]                                   # (B, 1, 1, C)
    r = rstd[:, :, None]
    xhat = (xf - m) * r
    ypre = xhat * g2[0] + b2[0]
    dyf = dy.astype(jnp.float32)
    if alpha != 1.0:
        dyf = jnp.where(ypre >= 0, dyf, alpha * dyf)
    db = jnp.sum(dyf, axis=(1, 2), keepdims=True)
    dg = jnp.sum(dyf * xhat, axis=(1, 2), keepdims=True)
    dxhat = dyf * g2[0]
    m1 = jnp.mean(dxhat, axis=(1, 2), keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=(1, 2), keepdims=True)
    dx = (r * (dxhat - m1 - xhat * m2)).astype(x.dtype)
    return dx, dg[:, 0], db[:, 0]


def _bwd_cp_partition(alpha, mesh, arg_shapes, result_shape):
    bspec = _batch_spec(arg_shapes[0].sharding)
    rep = NamedSharding(mesh, P())
    shd4 = NamedSharding(mesh, P(bspec, None, None, None))
    shd3 = NamedSharding(mesh, P(bspec, None, None))

    def lower_fn(xl, dyl, gl, bl, ml, rl):
        return _pallas_bwd_raw(xl, dyl, gl, bl, ml, rl, alpha,
                               interpret=_interpret_here())

    return (mesh, lower_fn, (shd4, shd3, shd3),
            (shd4, shd4, rep, rep, shd3, shd3))


_bwd_cp.def_partition(
    _bwd_cp_partition,
    sharding_rule=("b h w c, b h w c, i c, i c, b i c, b i c"
                   " -> b h w c, b i c, b i c"),
    need_replication_factors=("h", "w", "c", "i"),
)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_sharded(x, gamma, beta, eps: float, alpha: float):
    y, _, _ = _fwd_cp(x, gamma.astype(jnp.float32).reshape(1, -1),
                      beta.astype(jnp.float32).reshape(1, -1), eps, alpha)
    return y


def _fused_sharded_fwd(x, gamma, beta, eps, alpha):
    g2 = gamma.astype(jnp.float32).reshape(1, -1)
    b2 = beta.astype(jnp.float32).reshape(1, -1)
    y, mean, rstd = _fwd_cp(x, g2, b2, eps, alpha)
    return y, (x, gamma, beta, mean, rstd)


def _fused_sharded_bwd(eps, alpha, res, dy):
    x, gamma, beta, mean, rstd = res
    g2 = gamma.astype(jnp.float32).reshape(1, -1)
    b2 = beta.astype(jnp.float32).reshape(1, -1)
    dx, dg_part, db_part = _bwd_cp(x, dy, g2, b2, mean, rstd, alpha)
    # Batch-partial sums: a plain reduce GSPMD partitions into a psum.
    dgamma = jnp.sum(dg_part, axis=(0, 1)).astype(gamma.dtype)
    dbeta = jnp.sum(db_part, axis=(0, 1)).astype(beta.dtype)
    return dx, dgamma, dbeta


_fused_sharded.defvjp(_fused_sharded_fwd, _fused_sharded_bwd)


def instance_norm_act(x, gamma, beta, *, eps: float = 1e-3,
                      alpha: float = 1.0, backend: str = "auto",
                      interpret: bool = False):
    """InstanceNorm followed by leaky_relu(alpha) (alpha=1: none, 0: relu).

    backend='auto' takes the fused Pallas path on TPU when the per-sample
    slab fits the VMEM budget, else the plain-XLA composition (bit-identical
    to the historical unfused graph). backend='sharded' wraps the kernels in
    custom_partitioning for GSPMD-sharded jits (off-TPU shards run
    interpreted). NOTE: parallel/dp.py:_mesh_cfg currently routes mesh
    configs to the XLA composition (fused_instance_norm=False) — 'sharded'
    is an explicit opt-in, kept tested for when the fused kernel earns a
    mesh default."""
    if backend == "sharded" and _shape_supported(x.shape):
        return _fused_sharded(x, gamma, beta, eps, alpha)
    if backend == "pallas" or (backend == "auto" and fused_in_supported(x.shape)):
        return _fused(x, gamma, beta, eps, alpha, interpret)
    return instance_norm_act_xla(x, gamma, beta, eps=eps, alpha=alpha)
