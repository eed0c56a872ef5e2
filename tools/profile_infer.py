"""Device-time breakdown of the inference graph via jax.profiler.

jax.profiler works over the axon tunnel (CLAUDE.md, round-3 findings) and
is the ground truth for device time: wall-clock at small batch is dominated
by dispatch (~1-8 ms/call), so only the trace tells us where the chip time
goes. Parsing lives in tools/traceutil.py (shared with profile_train.py).

Usage (on TPU):
  PYTHONPATH=/root/repo python tools/profile_infer.py --batch 1
  PYTHONPATH=/root/repo python tools/profile_infer.py --batch 32 \
      --height 64 --width 256 --da --top 40 --instances 30

The timed body is a lax.scan carry chain over distinct stacked inputs
(bench.py protocol) so the trace contains ITERS back-to-back steps of the
same compiled module; the module's mean duration / ITERS is the true step
time (the `while` row in the op table is the scan wrapper — don't double
count it).
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
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--height", type=int, default=32)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--da", action="store_true")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--instances", type=int, default=0,
                    help="also print top-N per-HLO-instance rows")
    ap.add_argument("--logdir", default=None)
    args = ap.parse_args()

    from skyhdr.config import Config, DataConfig, ModelConfig
    from skyhdr.train.engine import create_gan_state, make_inference_fn

    cfg = Config(model=ModelConfig(im_height=args.height, im_width=args.width,
                                   use_da_conv=args.da,
                                   compute_dtype=args.dtype),
                 data=DataConfig(batch_size=args.batch))
    state = create_gan_state(cfg, jax.random.PRNGKey(0))
    infer = make_inference_fn(cfg, jit=False)
    shape = (args.batch, args.height, args.width, 3)

    @jax.jit
    def chain(gv, sv, xs):
        def body(c, x):
            out = infer(gv, sv, x + c)["y_final_lin"]
            return jnp.sum(out) * 0.0, ()
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), xs)
        return c

    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.uniform(0, 1, (args.iters,) + shape)
                     .astype(np.float32))
    # Compile + warm (never traced).
    float(np.asarray(chain(state.gen_vars, state.sun_vars, xs)))
    xs2 = jnp.asarray(rng.uniform(0, 1, (args.iters,) + shape)
                      .astype(np.float32))

    logdir = args.logdir or tempfile.mkdtemp(prefix="skyhdr_prof_")
    print(f"[profile] tracing {args.iters} chained steps -> {logdir}",
          file=sys.stderr, flush=True)
    jax.profiler.start_trace(logdir)
    c = chain(state.gen_vars, state.sun_vars, xs2)
    float(np.asarray(c))
    jax.profiler.stop_trace()

    events = load_trace_events(logdir)
    ops, modules, tid_names = device_op_events(events)
    if not ops:
        print("no op-level events found; thread names were:",
              sorted(set(tid_names.values())))
        return
    report(ops, modules, args.iters, top=args.top)
    if args.instances:
        report_instances(ops, args.iters, top=args.instances)
    if not args.logdir:
        shutil.rmtree(logdir, ignore_errors=True)


if __name__ == "__main__":
    main()
