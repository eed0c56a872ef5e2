"""InstanceNorm moment-computation variants at batch 1.

The b1 inference profile (tools/profile_infer.py, 2026-08-18) shows 45% of
device time (0.39 of 0.86 ms) in 28 tiny multiply_reduce_fusion ops from
InstanceNorm's jnp.var at skyhdr/models/layers.py:41 — ~14 us per reduce on
tensors whose bandwidth floor is <1 us, i.e. per-op sequencing overhead
dominates at b1. Variants that cut the number of serialized reduce ops:

  two_pass : current — jnp.mean then jnp.var ((x-m)^2 reduce depends on the
             mean reduce: two serialized reduces per IN)
  one_pass : E[x], E[x^2] as two INDEPENDENT jnp.sum calls (XLA can
             multi-output-fuse them into one pass); var = E[x^2] - m^2
  concat   : one reduce over concat([x, x*x], channel) — structurally a
             single reduce op per IN
  matmul   : moments via einsum('bhwc->bc') MXU reduction of the stacked
             tensor

Numerics: one-pass var suffers cancellation ~ (m^2/var) * 2^-24 relative;
with IN's eps=1e-3 and post-conv activations O(1-10) the absolute error is
~1e-5 — far below the tfa parity tolerance. Checked here against two_pass.

Run: PYTHONPATH=/root/repo python tools/exp_in.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def moments_two_pass(xf):
    mean = jnp.mean(xf, axis=(-3, -2), keepdims=True)
    var = jnp.var(xf, axis=(-3, -2), keepdims=True)
    return mean, var


def moments_one_pass(xf):
    n = xf.shape[-3] * xf.shape[-2]
    s1 = jnp.sum(xf, axis=(-3, -2), keepdims=True)
    s2 = jnp.sum(xf * xf, axis=(-3, -2), keepdims=True)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    return mean, var


def moments_concat(xf):
    n = xf.shape[-3] * xf.shape[-2]
    both = jnp.concatenate([xf, xf * xf], axis=-1)
    s = jnp.sum(both, axis=(-3, -2), keepdims=True) / n
    c = xf.shape[-1]
    mean, m2 = s[..., :c], s[..., c:]
    return mean, jnp.maximum(m2 - mean * mean, 0.0)


def moments_matmul(xf):
    b, h, w, c = xf.shape
    n = h * w
    flat = jnp.concatenate([xf, xf * xf], axis=-1).reshape(b, n, 2 * c)
    ones = jnp.ones((n,), xf.dtype)
    s = jnp.einsum("n,bnc->bc", ones, flat,
                   precision=jax.lax.Precision.HIGHEST) / n
    s = s.reshape(b, 1, 1, 2 * c)
    mean, m2 = s[..., :c], s[..., c:]
    return mean, jnp.maximum(m2 - mean * mean, 0.0)


VARIANTS = {
    "two_pass": moments_two_pass,
    "one_pass": moments_one_pass,
    "concat": moments_concat,
    "matmul": moments_matmul,
}


def patch_instance_norm(moments_fn):
    from skyhdr.models import layers

    layers.instance_moments = moments_fn


def time_infer(batch, iters=40, repeats=3):
    from skyhdr.config import Config
    from skyhdr.train.engine import create_gan_state, make_inference_fn

    cfg = Config()
    state = create_gan_state(cfg, jax.random.PRNGKey(0))
    infer = make_inference_fn(cfg, jit=False)
    shape = (batch, 32, 128, 3)

    @jax.jit
    def chain(gv, sv, xs):
        def body(c, x):
            out = infer(gv, sv, x + c)["y_final_lin"]
            return jnp.sum(out) * 0.0, ()
        return jax.lax.scan(body, jnp.zeros((), jnp.float32), xs)[0]

    rng = np.random.default_rng(0)

    def stack(r):
        return jnp.asarray(rng.uniform(0, 1, (iters,) + shape)
                           .astype(np.float32))

    float(np.asarray(chain(state.gen_vars, state.sun_vars, stack(99))))
    times = []
    for r in range(repeats):
        xs = stack(r)
        float(np.asarray(xs).ravel()[-1])
        t0 = time.perf_counter()
        c = chain(state.gen_vars, state.sun_vars, xs)
        float(np.asarray(c))
        times.append((time.perf_counter() - t0) / iters)
    # Sanity output for numeric comparison across variants.
    out = infer(state.gen_vars, state.sun_vars,
                jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32)))
    probe = float(jnp.sum(out["y_final_lin"]))
    return min(times), probe


def main():
    # Numeric agreement of the variants on a representative tensor.
    rng = np.random.default_rng(1)
    x = jnp.asarray((rng.standard_normal((2, 8, 32, 256)) * 3 + 5)
                    .astype(np.float32))
    m0, v0 = moments_two_pass(x)
    for name, fn in VARIANTS.items():
        m, v = fn(x)
        print(f"{name:9s} dmean={float(jnp.abs(m - m0).max()):.2e} "
              f"dvar={float(jnp.abs(v - v0).max()):.2e}")

    for batch in (1, 32):
        print(f"\n== batch {batch} ==")
        for name, fn in VARIANTS.items():
            patch_instance_norm(fn)
            dt, probe = time_infer(batch)
            print(f"  {name:9s} {dt * 1e3:7.3f} ms/step  probe={probe:.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
