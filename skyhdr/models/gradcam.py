"""Grad-CAM under JAX: gradient of the selected sun-pose probability w.r.t.
the three intermediate activation maps, turned into attention maps.

The reference computes `tf.gradients(y_c, A_k)` inside the outer tape's
stop_recording (grad_cam.py:29-44, train.py:257-271) — a second-order graph
that is NOT backpropped through. Here the same semantics fall out of a
single `jax.value_and_grad` over zero "perturbation" inputs added to each
activation (d/d(eps) at eps=0 == d/d(activation)), and the caller wraps the
result in lax.stop_gradient.

CAM construction (grad_cam.py:33-44): channel weights = GAP of the gradient,
cam = relu(sum_c w_c * A_c), one channel, no normalization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _select_y_c(sm, sunpose_gt):
    """y_c per sample: probability at the GT argmax bin (train.py:265-267),
    or the max probability when no GT is given (inference;
    train_sun.py:210)."""
    if sunpose_gt is None:
        return jnp.max(sm, axis=-1)
    idx = jnp.argmax(sunpose_gt, axis=-1)
    return jnp.take_along_axis(sm, idx[:, None], axis=-1)[:, 0]


def _yc_seed(sm, sunpose_gt):
    """d(sum_b y_c)/d(sm) as an explicit one-hot batch: the cotangent seed
    that replaces differentiating _select_y_c (y_c is a single gather per
    sample, so its gradient is a one-hot row at the selected bin)."""
    src = sm if sunpose_gt is None else sunpose_gt
    idx = jnp.argmax(src, axis=-1)
    return jax.nn.one_hot(idx, sm.shape[-1], dtype=sm.dtype)


def _cam_from_grad(grad, act):
    """relu(einsum('bc,bhwc->bhw')) with GAP channel weights
    (reference grad_cam.py:33-44). Returns [b, h, w, 1]."""
    weights = jnp.mean(grad, axis=(1, 2))  # [b, c]
    cam = jnp.einsum("bc,bhwc->bhw", weights, act)
    cam = jax.nn.relu(cam)
    return cam[..., None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _sunpose_cams_core(sunpose_apply, sun_vars, x, sunpose_gt):
    return _sunpose_cams_fwd(sunpose_apply, sun_vars, x, sunpose_gt)[0]


def _sunpose_cams_fwd(sunpose_apply, sun_vars, x, sunpose_gt):
    """ONE network forward serves the KL path, the CAM gradients AND (via
    saved vjp residuals) the outer backward.

    The previous structure ran a separate differentiable forward next to a
    gradient-stopped `jax.value_and_grad` forward and relied on XLA CSE to
    merge them; profiling on the 64x256 config showed CSE never fires (the
    CAM forward's fusions also emit the activations, so the fc matmuls —
    2.1 GB of weight streaming each at that size — executed twice).
    custom_vjp makes the sharing structural instead of hoping for CSE, and
    it also keeps the outer AD away from the CAM pull graph, which contains
    Pallas custom-vjp ops with no JVP rule (the old code needed
    symbolic-zero tangents for that; here the fwd is simply never
    differentiated)."""
    sm_shape, act_shapes = jax.eval_shape(
        lambda v, xx: sunpose_apply(v, xx, None), sun_vars, x
    )
    eps0 = tuple(jnp.zeros(s.shape, s.dtype) for s in act_shapes)
    zeros_acts = tuple(jnp.zeros(s.shape, s.dtype) for s in act_shapes)

    (sm, acts), pull = jax.vjp(
        lambda v, xx, e: sunpose_apply(v, xx, e), sun_vars, x, eps0
    )

    # CAM gradients: d(sum y_c)/d(activation) = pull of the one-hot seed
    # through the SAME residuals (d/d(eps) at eps=0 == d/d(activation)).
    seed = _yc_seed(jax.lax.stop_gradient(sm), sunpose_gt)
    _, _, deps = pull((seed, zeros_acts))
    cams = tuple(_cam_from_grad(g, a) for g, a in zip(deps, acts))
    return (sm, cams), (pull, zeros_acts)


def _sunpose_cams_bwd(sunpose_apply, res, ct):
    """Outer cotangent flows through `sm` only; the CAM cotangents are
    DISCARDED — the stop_recording semantics of reference train.py:257-271.
    The pull closure from the forward is reused, so the backward shares the
    forward's residuals instead of rebuilding the network."""
    pull, zeros_acts = res
    d_sm, _d_cams = ct
    d_vars, d_x, _ = pull((d_sm, zeros_acts))
    # sunpose_gt only selects the CAM bin (argmax) — zero cotangent.
    return d_vars, d_x, None


_sunpose_cams_core.defvjp(_sunpose_cams_fwd, _sunpose_cams_bwd)


def sunpose_with_cams(sunpose_apply, sun_vars, x, sunpose_gt=None):
    """Run the sun-pose net and produce the three Grad-CAM maps.

    sunpose_apply: bound apply fn (vars, x, eps) -> (sm, (a1, a2, a3)).
    Returns (sm [b, bins], (cam1, cam2, cam3)). The outer loss gradient
    flows through `sm` but not through the attention maps, mirroring the
    reference's stop_recording block (train.py:257); see _sunpose_cams_fwd
    for the single-forward structure.
    """
    return _sunpose_cams_core(sunpose_apply, sun_vars, x, sunpose_gt)
