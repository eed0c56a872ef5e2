"""Batch-partitioned distortion-aware conv for GSPMD/Shardy meshes.

Why this exists: the Pallas kernels in skyhdr.ops.pallas.deform_conv lower
to opaque Mosaic custom calls, and XLA's SPMD partitioner cannot see inside
them — a `pallas_call` inside a sharded jit would be replicated (or
rejected outright). The DA conv is trivially data-parallel (every sample is
independent; the weights are shared), so this module teaches the
partitioner exactly that via `jax.experimental.custom_partitioning`:

  * forward  out[b] = conv(x[b], K)        — batch dim propagates, all
    spatial/channel dims forced replicated;
  * dx       dx[b]  = conv^T(g[b], K)      — same rule on the cotangent;
  * dK       dK     = sum_b remat(x[b], g[b]) — batch is a REDUCTION
    factor: each shard computes a partial dK and the lowering psums it
    over the mesh axes that shard the batch.

Each wrapped op has two implementations that compute identical values:

  * the *body* (traced by custom_partitioning to define semantics) is a
    table-parametrized XLA gather graph. It must be const-free — the
    static index tables therefore arrive as ARGUMENTS (replicated), not as
    closed-over numpy constants (custom_partitioning rejects jaxpr consts);
  * the *lower_fn* (what actually runs per shard) calls the fused Pallas
    kernels on the shard-local batch; on CPU meshes it runs them under
    `interpret=True` (the pure-JAX Pallas interpreter — the TPU-interpret
    mode's io_callbacks are side-effecting and cannot live inside a
    partitioned module), which is how the 8-virtual-device tests drive the
    real kernel logic per shard.

Selected by ModelConfig.da_backend == "sharded"; skyhdr.parallel.dp flips
the config to it automatically so multi-device training takes this path
while the single-chip benchmarks keep the direct (un-wrapped) kernels.

Reference: the op this partitions is distortion_aware_ops.py:5-270; the
reference has no multi-device story at all (SURVEY.md §2.3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

from skyhdr.ops.distortion import deformable_conv2d, gather_tables
from skyhdr.ops.pallas.deform_conv import (
    _pallas_dk,
    _pallas_dx,
    _pallas_forward,
    pallas_bwd_supported,
    pallas_supported,
)


def _interpret() -> bool:
    """Compiled Mosaic on TPU; the pure-JAX interpreter elsewhere."""
    return jax.default_backend() != "tpu"


def _tables(h: int, w: int, kernel_size: int, dilation_rate: int,
            skydome: bool):
    """Gather tables as jnp arrays — explicit operands of the cp ops."""
    t = gather_tables(h, w, kernel_size, 1, dilation_rate, skydome)
    return tuple(jnp.asarray(a) for a in (t.y0, t.y1, t.wy, t.wx, t.cx0))


def _table_conv(x, kernel, y0, y1, wy, wx, cx):
    """Const-free XLA DA conv: the same math as
    skyhdr.ops.distortion.deformable_conv2d (stride 1), but every static
    table is a traced argument so custom_partitioning can trace it."""
    b, h, w, c = x.shape
    k2 = y0.shape[1]
    f = kernel.shape[-1]
    pad = (round(k2 ** 0.5) - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0)))
    kern = kernel.reshape(k2, c, f)
    out = jnp.zeros((b, h, w, f), jnp.float32)
    jw = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    ih = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    for tap in range(k2):
        wyt = wy[:, tap][None, :, None, None]
        wxt = wx[:, tap][None, :, None, None]
        row0 = jnp.take(xp, y0[:, tap], axis=1)
        row1 = jnp.take(xp, y1[:, tap], axis=1)
        row_y = (1 - wyt) * row0 + wyt * row1
        xmat = (jw + cx[:, tap][:, None]) % w
        g0 = row_y[:, ih, xmat, :]
        g1 = jnp.roll(g0, -1, axis=2)
        sample = (1 - wxt) * g0 + wxt * g1
        out = out + jnp.einsum("bhwc,cf->bhwf", sample, kern[tap],
                               preferred_element_type=jnp.float32)
    return out


def _batch_spec(sharding):
    """The mesh-axis (or axes) sharding dim 0, or None."""
    spec = getattr(sharding, "spec", None)
    if not spec:
        return None
    return spec[0]


_TABLE_RULE = "ho kk, ho kk, ho kk, ho kk, ho kk"
# Shardy requires the special-factor lists sorted by each factor's
# first-appearance index in the rule string — hence one list per op.
_FWD_REPLICATED = ("h", "w", "c", "kc", "f", "ho", "kk")
_DX_REPLICATED = ("h", "w", "f", "kc", "ho", "kk", "c")
_DK_REPLICATED = ("h", "w", "c", "f", "ho", "kk", "kc")


# --- forward ---------------------------------------------------------------

@functools.partial(custom_partitioning, static_argnums=(7, 8, 9))
def _fwd_cp(x, kernel, y0, y1, wy, wx, cx,
            kernel_size, dilation_rate, skydome):
    return _table_conv(x, kernel, y0, y1, wy, wx, cx)


def _fwd_partition(ks, dr, sd, mesh, arg_shapes, result_shape):
    bspec = _batch_spec(arg_shapes[0].sharding)
    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P(bspec, None, None, None))
    arg_shardings = (shd, rep, rep, rep, rep, rep, rep)

    def lower_fn(xl, kl, *tabs):
        return _pallas_forward(xl, kl, kernel_size=ks, dilation_rate=dr,
                               skydome=sd, interpret=_interpret())

    return mesh, lower_fn, shd, arg_shardings


_fwd_cp.def_partition(
    _fwd_partition,
    sharding_rule=f"b h w c, kc f, {_TABLE_RULE} -> b h w f",
    need_replication_factors=_FWD_REPLICATED,
)


# --- dx (cotangent wrt the input) ------------------------------------------

@functools.partial(custom_partitioning, static_argnums=(7, 8, 9))
def _dx_cp(g, kernel, y0, y1, wy, wx, cx,
           kernel_size, dilation_rate, skydome):
    b, h, w, f = g.shape
    c = kernel.shape[0] // (kernel_size * kernel_size)
    zeros = jnp.zeros((b, h, w, c), jnp.float32)
    _, pull = jax.vjp(
        lambda xx: _table_conv(xx, kernel, y0, y1, wy, wx, cx), zeros)
    (dx,) = pull(g)
    return dx


def _dx_partition(ks, dr, sd, mesh, arg_shapes, result_shape):
    bspec = _batch_spec(arg_shapes[0].sharding)
    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P(bspec, None, None, None))
    arg_shardings = (shd, rep, rep, rep, rep, rep, rep)
    c = arg_shapes[1].shape[0] // (ks * ks)

    def lower_fn(gl, kl, *tabs):
        b, h, w, _ = gl.shape
        return _pallas_dx(gl, kl, kernel_size=ks, dilation_rate=dr,
                          skydome=sd, x_shape=(b, h, w, c),
                          interpret=_interpret())

    return mesh, lower_fn, shd, arg_shardings


_dx_cp.def_partition(
    _dx_partition,
    sharding_rule=f"b h w f, kc f, {_TABLE_RULE} -> b h w c",
    need_replication_factors=_DX_REPLICATED,
)


# --- dK (cotangent wrt the kernel; batch is a reduction factor) ------------

@functools.partial(custom_partitioning, static_argnums=(7, 8, 9, 10))
def _dk_cp(x, g, y0, y1, wy, wx, cx,
           kernel_size, dilation_rate, skydome, f):
    k2 = kernel_size * kernel_size
    c = x.shape[-1]
    zeros = jnp.zeros((k2 * c, f), jnp.float32)
    _, pull = jax.vjp(
        lambda kk: _table_conv(x, kk, y0, y1, wy, wx, cx), zeros)
    (dk,) = pull(g)
    return dk


def _dk_partition(ks, dr, sd, f, mesh, arg_shapes, result_shape):
    bspec = _batch_spec(arg_shapes[0].sharding)
    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P(bspec, None, None, None))
    arg_shardings = (shd, shd, rep, rep, rep, rep, rep)
    axes = bspec if isinstance(bspec, tuple) else (bspec,) if bspec else ()

    def lower_fn(xl, gl, *tabs):
        dk = _pallas_dk(xl, gl, kernel_size=ks, dilation_rate=dr,
                        skydome=sd, f=f, interpret=_interpret())
        # Each shard saw only its batch slice: all-reduce the partial sums
        # over every mesh axis that sharded the batch.
        for ax in axes:
            dk = jax.lax.psum(dk, ax)
        return dk

    return mesh, lower_fn, rep, arg_shardings


_dk_cp.def_partition(
    _dk_partition,
    sharding_rule=f"b h w c, b h w f, {_TABLE_RULE} -> kc f",
    reduction_factors=("b",),
    need_replication_factors=_DK_REPLICATED,
)


# --- custom-VJP assembly ---------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _da_sharded_core(x, kernel, bias, kernel_size, dilation_rate, skydome):
    tabs = _tables(x.shape[1], x.shape[2], kernel_size, dilation_rate,
                   skydome)
    out = _fwd_cp(x, kernel, *tabs, kernel_size, dilation_rate, skydome)
    return (out + bias).astype(x.dtype)


def _da_sharded_fwd(x, kernel, bias, kernel_size, dilation_rate, skydome):
    return (_da_sharded_core(x, kernel, bias, kernel_size, dilation_rate,
                             skydome),
            (x, kernel, bias))


def _da_sharded_bwd(kernel_size, dilation_rate, skydome, res, g):
    x, kernel, bias = res
    if not pallas_bwd_supported(x.shape, g.shape, kernel_size):
        _, vjp = jax.vjp(
            lambda xx, kk, bb: deformable_conv2d(
                xx, kk, bb, kernel_size=kernel_size, stride=1,
                dilation_rate=dilation_rate, skydome=skydome),
            x, kernel, bias)
        return vjp(g)
    tabs = _tables(x.shape[1], x.shape[2], kernel_size, dilation_rate,
                   skydome)
    g32 = g.astype(jnp.float32)
    dx = _dx_cp(g32, kernel, *tabs, kernel_size, dilation_rate,
                skydome).astype(x.dtype)
    dk = _dk_cp(x, g32, *tabs, kernel_size, dilation_rate, skydome,
                kernel.shape[-1]).astype(kernel.dtype)
    db = jnp.sum(g32, axis=(0, 1, 2)).astype(bias.dtype)
    return dx, dk, db


_da_sharded_core.defvjp(_da_sharded_fwd, _da_sharded_bwd)


def deformable_conv2d_sharded(x, kernel, bias, *, kernel_size: int = 3,
                              stride: int = 1, dilation_rate: int = 1,
                              skydome: bool = True):
    """Batch-partitionable DA conv: Pallas per shard under GSPMD/Shardy.

    Falls back to the plain XLA path (natively partitionable) when the
    shape is outside the Pallas kernels' support envelope."""
    if not pallas_supported(x.shape, kernel_size, stride):
        return deformable_conv2d(x, kernel, bias, kernel_size=kernel_size,
                                 stride=stride, dilation_rate=dilation_rate,
                                 skydome=skydome)
    return _da_sharded_core(x, kernel, bias, kernel_size, dilation_rate,
                            skydome)
