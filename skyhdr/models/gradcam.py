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


def _cam_from_grad(grad, act):
    """relu(einsum('bc,bhwc->bhw')) with GAP channel weights
    (reference grad_cam.py:33-44). Returns [b, h, w, 1]."""
    weights = jnp.mean(grad, axis=(1, 2))  # [b, c]
    cam = jnp.einsum("bc,bhwc->bhw", weights, act)
    cam = jax.nn.relu(cam)
    return cam[..., None]


def sunpose_with_cams(sunpose_apply, sun_vars, x, sunpose_gt=None):
    """Run the sun-pose net and produce the three Grad-CAM maps.

    sunpose_apply: bound apply fn (vars, x, eps) -> (sm, (a1, a2, a3)).
    Returns (sm [b, bins], (cam1, cam2, cam3)). CAMs (and only CAMs) are
    gradient-stopped, mirroring the reference's stop_recording block
    (train.py:257): the outer loss gradient flows through `sm` but not
    through the attention maps.
    """
    # Probe shapes without building perturbations by hand.
    sm_shape, act_shapes = jax.eval_shape(
        lambda v, xx: sunpose_apply(v, xx, None), sun_vars, x
    )
    eps0 = tuple(jnp.zeros(s.shape, s.dtype) for s in act_shapes)

    # Differentiable path for the KL loss: a plain forward (XLA CSEs it
    # against the CAM forward below — identical primal computation).
    sm = sunpose_apply(sun_vars, x, None)[0]

    # CAM path from gradient-STOPPED copies: the outer loss linearization
    # must never push tangents into this inner vjp — it contains
    # pallas_call ops (DA convs) with no JVP rule, and the reference
    # computes CAMs inside stop_recording anyway (train.py:257-271).
    # With all inputs stopped, every op here carries symbolic-zero
    # tangents and the outer AD skips them entirely.
    sv0 = jax.lax.stop_gradient(sun_vars)
    x0 = jax.lax.stop_gradient(x)
    gt0 = (None if sunpose_gt is None
           else jax.lax.stop_gradient(sunpose_gt))

    def f(eps):
        sm_c, acts = sunpose_apply(sv0, x0, eps)
        y_c = _select_y_c(sm_c, gt0)
        return jnp.sum(y_c), acts

    # One forward + one backward; grads arrive for all three activations.
    (_, acts), grads = jax.value_and_grad(f, has_aux=True)(eps0)

    cams = tuple(
        jax.lax.stop_gradient(_cam_from_grad(g, a)) for g, a in zip(grads, acts)
    )
    return sm, cams
