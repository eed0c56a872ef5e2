"""TPU equality check: Mosaic-compiled fused IN (ops/pallas/instnorm.py)
vs the plain-XLA composition — values and grads, all activation modes,
f32 + bf16. Run on the real TPU; ~8 small jit compiles."""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from skyhdr.ops.pallas.instnorm import instance_norm_act, instance_norm_act_xla

CASES = (
    (jnp.bfloat16, 0.1, 64, (32, 128)),
    (jnp.bfloat16, 0.0, 32, (32, 128)),
    (jnp.bfloat16, 1.0, 256, (8, 32)),
    (jnp.float32, 0.1, 64, (32, 128)),
)


def main():
    print("backend:", jax.default_backend(), flush=True)
    for dtype, alpha, c, hw in CASES:
        x = jax.random.normal(jax.random.PRNGKey(0), (8,) + hw + (c,), dtype) * 2 + 0.3
        g = jax.random.uniform(jax.random.PRNGKey(1), (c,), jnp.float32, 0.5, 1.5)
        b = jax.random.normal(jax.random.PRNGKey(2), (c,)) * 0.1

        def vg(fn):
            def loss(x, g, b):
                y = fn(x, g, b)
                return jnp.sum(jnp.sin(y.astype(jnp.float32))), y
            return jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2),
                                              has_aux=True))

        (_, yr), gr = vg(lambda x, g, b: instance_norm_act_xla(
            x, g, b, alpha=alpha))(x, g, b)
        (_, yp), gp = vg(lambda x, g, b: instance_norm_act(
            x, g, b, alpha=alpha, backend="pallas"))(x, g, b)
        verr = float(np.abs(np.asarray(yp, np.float32)
                            - np.asarray(yr, np.float32)).max())
        rel = [float(np.abs(np.asarray(a, np.float32)
                            - np.asarray(c2, np.float32)).max()
                     / (np.abs(np.asarray(a, np.float32)).max() + 1e-9))
               for a, c2 in zip(gr, gp)]
        print(f"{np.dtype(dtype).name} alpha={alpha} c={c} hw={hw}: "
              f"val {verr:.2e} rel-grads {['%.2e' % e for e in rel]}",
              flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
