"""Device-time breakdown of the GAN (or sun) train step via jax.profiler.

Train steps chain naturally through the donated state, so the traced loop
is the production dispatch pattern. See tools/profile_infer.py for the
inference counterpart and tools/traceutil.py for parsing.

Usage (on TPU):
  PYTHONPATH=/root/repo python tools/profile_train.py --batch 32
  PYTHONPATH=/root/repo python tools/profile_train.py --sun --batch 32
  PYTHONPATH=/root/repo python tools/profile_train.py --height 64 \
      --width 256 --da --batch 8 --instances 20
"""

import argparse
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from traceutil import (device_op_events, load_trace_events, report,
                       report_instances)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--height", type=int, default=32)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--da", action="store_true")
    ap.add_argument("--sun", action="store_true", help="sun pretrain step")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--opt-state-dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--grad-dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--param-dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--instances", type=int, default=0,
                    help="also print top-N per-HLO-instance rows")
    ap.add_argument("--logdir", default=None)
    args = ap.parse_args()

    from skyhdr.config import Config, DataConfig, ModelConfig, TrainConfig
    from skyhdr.data.degradation import make_banks
    from skyhdr.models.vgg16 import random_vgg16_weights
    from skyhdr.train.engine import (create_gan_state, create_sun_state,
                                     make_gan_train_step, make_sun_train_step)
    from skyhdr.utils.io import get_exposure_lists, make_synthetic_dorf

    cfg = Config(model=ModelConfig(im_height=args.height, im_width=args.width,
                                   use_da_conv=args.da,
                                   compute_dtype=args.dtype),
                 data=DataConfig(batch_size=args.batch),
                 train=TrainConfig(opt_state_dtype=args.opt_state_dtype,
                                   grad_dtype=args.grad_dtype,
                                   param_dtype=args.param_dtype))
    banks = make_banks(make_synthetic_dorf(175, 1024), get_exposure_lists()[0])
    if args.sun:
        step = make_sun_train_step(cfg, banks, jit=False)
        state = create_sun_state(cfg, jax.random.PRNGKey(0))
        metric = "sun_total"
    else:
        step = make_gan_train_step(cfg, banks, random_vgg16_weights(),
                                   jit=False)
        state = create_gan_state(cfg, jax.random.PRNGKey(0))
        metric = "gen_total"
    step = jax.jit(step, donate_argnums=(0,))

    b = cfg.data.batch_size
    shape = (b, args.height, args.width, 3)
    rng = np.random.default_rng(0)

    def batches(seed, n):
        r = np.random.default_rng(seed)
        return [{
            "hdr": jnp.asarray(r.uniform(0, 2, shape).astype(np.float32)),
            "elevation": jnp.asarray(np.linspace(4, 28, b).astype(np.float32)),
        } for _ in range(n)]

    keys = jax.random.split(jax.random.PRNGKey(1), args.iters + 2)
    # Compile + warm outside the trace.
    for bt, k in zip(batches(99, 2), keys[:2]):
        state, m = step(state, bt, k)
    float(np.asarray(m[metric]))

    logdir = args.logdir or tempfile.mkdtemp(prefix="skyhdr_prof_train_")
    print(f"[profile] tracing {args.iters} donated steps -> {logdir}",
          file=sys.stderr, flush=True)
    jax.profiler.start_trace(logdir)
    for bt, k in zip(batches(0, args.iters), keys[2:]):
        state, m = step(state, bt, k)
    float(np.asarray(m[metric]))
    jax.profiler.stop_trace()

    events = load_trace_events(logdir)
    ops, modules, tid_names = device_op_events(events)
    if not ops:
        print("no op-level events; threads:", sorted(set(tid_names.values())))
        return
    report(ops, modules, args.iters, top=args.top)
    if args.instances:
        report_instances(ops, args.iters, top=args.instances)
    if not args.logdir:
        shutil.rmtree(logdir, ignore_errors=True)


if __name__ == "__main__":
    main()
