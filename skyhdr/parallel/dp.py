"""Data-parallel training: batch sharded over the `data` mesh axis, model
state replicated. The step function itself is the single-device one
(skyhdr.train.engine); jit + sharding annotations make XLA partition the
batch dimension and insert the gradient all-reduce over ICI — no NCCL-style
backend is hand-built, per the TPU recipe in SURVEY.md §2.3.
"""

from __future__ import annotations

import dataclasses

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from skyhdr.config import Config
from skyhdr.data.degradation import DegradationBanks
from skyhdr.train.engine import make_gan_train_step, make_sun_train_step


def _mesh_cfg(cfg: Config, shard_width: bool = False) -> Config:
    """Route model internals to their GSPMD-safe variants.

    * DA convs: inside a GSPMD-sharded jit the plain Pallas path is an
      opaque custom call the partitioner cannot split; route through the
      custom_partitioning wrappers (skyhdr.ops.pallas.sharded) instead.
      Explicit da_backend settings ('xla', 'pallas') are respected.
    * Width-folded tiny convs: XLA's SPMD partitioner MISCOMPILES the
      folded stride-F conv when the width axis is sharded together with a
      sharded batch (wrong values on a (data>=2, width>=2) mesh, verified
      2026-08-19 vs single-device; data-only and width-only layouts are
      exact) — disable folding whenever the width is sharded."""
    model = cfg.model
    if model.use_da_conv and model.da_backend == "auto":
        model = dataclasses.replace(model, da_backend="sharded")
    if shard_width and model.fold_tiny_convs:
        model = dataclasses.replace(model, fold_tiny_convs=False)
    if model.fused_instance_norm:
        # The fused IN pallas_call is an opaque custom call to the SPMD
        # partitioner: under any sharding it would be all-gathered onto
        # every device. Route back to the (partitionable) XLA composition.
        model = dataclasses.replace(model, fused_instance_norm=False)
    return cfg if model is cfg.model else cfg.replace(model=model)


def _shardings_for_batch(mesh: Mesh, shard_width: bool = False):
    hdr_spec = (P("data", None, "width", None) if shard_width else P("data"))
    return {
        "hdr": NamedSharding(mesh, hdr_spec),
        "elevation": NamedSharding(mesh, P("data")),
    }


def make_parallel_gan_train_step(cfg: Config, banks: DegradationBanks,
                                 vgg_weights, mesh: Mesh,
                                 shard_width: bool = False):
    """Jitted GAN train step with the batch sharded over `data` (and the
    panorama width over `width` when shard_width=True — GSPMD spatial
    partitioning with automatic halo exchange for the convs).

    State/params are replicated; per-device gradients are reduced by XLA.
    Returns (step_fn, shard_batch) where shard_batch places a host batch
    onto the mesh.
    """
    rep = NamedSharding(mesh, P())
    batch_sh = _shardings_for_batch(mesh, shard_width)

    # Build the raw python step (jit=False) and jit it once with explicit
    # shardings — never unwrap a jitted callable.
    raw_step = make_gan_train_step(_mesh_cfg(cfg, shard_width), banks,
                                   vgg_weights, jit=False)

    step = jax.jit(
        raw_step,
        in_shardings=(rep, batch_sh, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )

    def shard_batch(batch):
        return {k: jax.device_put(v, batch_sh[k]) for k, v in batch.items()}

    return step, shard_batch


def make_parallel_sun_train_step(cfg: Config, banks: DegradationBanks,
                                 mesh: Mesh):
    rep = NamedSharding(mesh, P())
    batch_sh = _shardings_for_batch(mesh)
    raw_step = make_sun_train_step(_mesh_cfg(cfg), banks, jit=False)
    step = jax.jit(
        raw_step,
        in_shardings=(rep, batch_sh, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )

    def shard_batch(batch):
        return {k: jax.device_put(v, batch_sh[k]) for k, v in batch.items()}

    return step, shard_batch
