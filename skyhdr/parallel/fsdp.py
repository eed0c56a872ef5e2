"""FSDP-style (ZeRO-3) sharded training state over the `data` mesh axis.

Why this exists: the 64x256 scale-up config's training state is dominated by
the reference's own h*w-wide sunpose FC layers (sunpose_net.py:36) — 3.2 GB
of f32 parameters, 9.7 GB with Adam moments (SunState) and 9.9 GB for the
GAN composite (params + RMSprop moments). Pure data parallelism (dp.py)
replicates all of it on every chip; at 64x256 that leaves little HBM for
activations, and past ~128x512 it stops fitting at all. FSDP shards every
large state leaf across the `data` axis so per-chip state falls ~1/n.

TPU-first mechanics: this is *sharding annotations only*. The train step is
the unmodified single-device one (skyhdr.train.engine); jit in/out shardings
mark each big leaf `P(..., "data", ...)` and XLA's SPMD partitioner inserts
the all-gather that materializes full parameters for fwd/bwd and the
reduce-scatter that returns per-shard gradients/updates — the standard
scaling-book ZeRO recipe, riding ICI. No hand-built collectives, no
parameter-server logic, nothing for the runtime to coordinate.

Composability: the batch stays sharded over `data` (and optionally `width`,
as in dp.py), so FSDP here is DP + sharded state, not a separate topology.
Leaves too small to matter (conv kernels, biases, BN stats, step counters)
stay replicated — sharding them would add collective latency for no HBM win.
"""

from __future__ import annotations

import math

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from skyhdr.config import Config
from skyhdr.data.degradation import DegradationBanks
from skyhdr.parallel.dp import _mesh_cfg, _shardings_for_batch
from skyhdr.train.engine import (
    create_gan_state,
    create_sun_state,
    make_gan_train_step,
    make_sun_train_step,
)

# Leaves smaller than this stay replicated: an all-gather of a 30 KB conv
# kernel costs more in collective latency than it saves in HBM.
DEFAULT_MIN_BYTES = 1 << 20


def _leaf_spec(leaf, n_shards: int, min_bytes: int) -> P:
    """Shard the LAST evenly-divisible dimension of a big leaf over `data`;
    everything else replicated. Works on concrete arrays and
    jax.eval_shape's ShapeDtypeStructs alike (only .shape/.dtype are read,
    so shardings can be planned without allocating the 9.9 GB state).

    Trailing-dim preference is deliberate (not just a tie-break): the big
    leaves are the sunpose FC kernels [h*w*c, bins] and their moments, and
    the model reshapes the kernel to [h, w, c, bins]
    (models/sunpose.py:SpatialDense). A dim-0 sharding would shatter
    across (h, w, c) in that reshape, and the Grad-CAM second-order
    backward's dX dot then inherits a spatial sharding that the SPMD
    partitioner can only reconcile by involuntary full rematerialization
    (spmd_partitioner.cc:652 in the r4 dryrun). Sharding the OUTPUT dim
    (Megatron column-parallel convention) survives the reshape unchanged;
    the HBM saving is identical either way."""
    shape = getattr(leaf, "shape", ())
    dtype = getattr(leaf, "dtype", None)
    if dtype is None or not shape:
        return P()
    nbytes = math.prod(shape) * np.dtype(dtype).itemsize
    if nbytes < min_bytes:
        return P()
    for d in reversed(range(len(shape))):
        if shape[d] >= n_shards and shape[d] % n_shards == 0:
            spec = [None] * len(shape)
            spec[d] = "data"
            return P(*spec)
    return P()


def fsdp_state_sharding(state, mesh: Mesh,
                        min_bytes: int = DEFAULT_MIN_BYTES):
    """Pytree of NamedShardings for a train state (concrete or abstract)."""
    n = mesh.shape["data"]
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, _leaf_spec(leaf, n, min_bytes)),
        state)


def _make_fsdp_step(raw_step, abstract_state, mesh, min_bytes, shard_width):
    state_sh = fsdp_state_sharding(abstract_state, mesh, min_bytes)
    batch_sh = _shardings_for_batch(mesh, shard_width)
    rep = NamedSharding(mesh, P())

    step = jax.jit(
        raw_step,
        in_shardings=(state_sh, batch_sh, rep),
        out_shardings=(state_sh, rep),
        donate_argnums=(0,),
    )

    def shard_state(state):
        """Place a (host- or single-device-) state onto its FSDP layout."""
        return jax.device_put(state, state_sh)

    def shard_batch(batch):
        return {k: jax.device_put(v, batch_sh[k]) for k, v in batch.items()}

    return step, shard_state, shard_batch


def make_fsdp_gan_train_step(cfg: Config, banks: DegradationBanks,
                             vgg_weights, mesh: Mesh,
                             shard_width: bool = False,
                             min_bytes: int = DEFAULT_MIN_BYTES):
    """GAN train step with ZeRO-sharded state + data-parallel batch.

    Returns (step_fn, shard_state, shard_batch). step_fn has the same
    signature/semantics as the single-device make_gan_train_step product;
    shard_state places an existing GanState onto the FSDP layout (use once
    at startup or after a host-side checkpoint restore).
    """
    abstract = jax.eval_shape(
        lambda k: create_gan_state(cfg, k), jax.random.PRNGKey(0))
    raw_step = make_gan_train_step(_mesh_cfg(cfg, shard_width), banks,
                                   vgg_weights, jit=False)
    return _make_fsdp_step(raw_step, abstract, mesh, min_bytes, shard_width)


def make_fsdp_sun_train_step(cfg: Config, banks: DegradationBanks,
                             mesh: Mesh,
                             min_bytes: int = DEFAULT_MIN_BYTES):
    """Sun-pretrain step with ZeRO-sharded state (the 64x256 SunState is the
    single biggest object in the framework: 9.7 GB f32 with Adam moments)."""
    abstract = jax.eval_shape(
        lambda k: create_sun_state(cfg, k), jax.random.PRNGKey(0))
    raw_step = make_sun_train_step(_mesh_cfg(cfg), banks, jit=False)
    return _make_fsdp_step(raw_step, abstract, mesh, min_bytes,
                           shard_width=False)
