"""Parameter-tree dtype utilities.

Why this exists (TPU HBM-bandwidth lever): Flax modules built with
``dtype=bfloat16`` cast their parameters *inside the jitted graph*, so XLA
still streams the full-width f32 bytes from HBM on every step and converts
on-core. At the 64x256 scale-up config the sun-pose net's h*w-wide FC
weights (the reference's own design, sunpose_net.py:36-43) are ~3.2 GB —
profiler-measured ~8 ms/step of pure f32 weight streaming, AT the v5e HBM
floor. Casting the stored parameters to bf16 once, outside the graph,
halves that traffic; the in-graph promotion rules then make the cast a
no-op (bf16 compute) or a fused cheap upcast (f32 compute).

Only the ``params`` collection should be cast: ``batch_stats`` hold running
BatchNorm moments whose (x - mean)/sqrt(var + eps) math wants full
precision, and they are tiny (no bandwidth win).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype):
    """Cast every floating-point leaf of ``tree`` to ``dtype``.

    Integer / bool leaves (step counters, bin indices) pass through
    unchanged. Accepts any pytree (FrozenDict, dict, TrainState subtree).
    """
    dtype = jnp.dtype(dtype)

    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, tree)


def cast_model_vars(model_vars, dtype):
    """Cast the ``params`` collection of a Flax variable dict to ``dtype``,
    leaving every other collection (``batch_stats`` running moments, ...)
    untouched. Used by the inference/evaluate CLIs and bench.py for
    bf16-weight serving."""
    out = dict(model_vars)
    if "params" in out:
        out["params"] = cast_floating(out["params"], dtype)
    return out
