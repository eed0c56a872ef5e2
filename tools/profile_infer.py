"""Device-time breakdown of the inference graph via jax.profiler.

jax.profiler works over the axon tunnel (CLAUDE.md, round-3 findings) and
is the ground truth for device time: wall-clock at small batch is dominated
by dispatch (~1-8 ms/call), so only the trace tells us where the chip time
goes. The trace's XLA-op track carries `source`/`tf_op`-style attribution
we aggregate here.

Usage (on TPU):
  PYTHONPATH=/root/repo python tools/profile_infer.py --batch 1
  PYTHONPATH=/root/repo python tools/profile_infer.py --batch 32 \
      --height 64 --width 256 --da --top 40

The timed body is a lax.scan carry chain over distinct stacked inputs
(bench.py protocol) so the trace contains ITERS back-to-back steps of the
same compiled module; per-op totals divided by ITERS give per-step cost.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def load_trace_events(logdir):
    """All complete ('X') events from the newest .trace.json.gz in logdir."""
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no trace under {logdir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    return data["traceEvents"]


def device_op_events(events):
    """XLA op events from the device track.

    On this runtime the TPU device process exposes thread-name metadata;
    the op-level track is the tid whose events carry XLA op args (`run_id`,
    or long fusion names). We pick all threads whose events have
    args with 'tf_op'/'source' or whose thread name contains 'XLA Op'.
    Fallback: every X event not on a python/runtime thread.
    """
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e.get("pid"), e.get("tid"))] = e["args"].get("name", "")
    op_tracks = {k for k, v in tid_names.items()
                 if re.search(r"xla ?op|tensorflow op", v, re.I)}
    module_tracks = {k for k, v in tid_names.items()
                     if re.search(r"xla module", v, re.I)}
    ops, modules = [], []
    for e in events:
        if e.get("ph") != "X":
            continue
        key = (e.get("pid"), e.get("tid"))
        if key in op_tracks:
            ops.append(e)
        elif key in module_tracks:
            modules.append(e)
    return ops, modules, tid_names


_CATEGORY_RULES = [
    ("fc/matmul", r"dot|matmul|einsum"),
    ("conv", r"conv"),
    ("copy/relayout", r"copy|transpose|reshape|bitcast|concatenate|slice|pad"),
    ("reduce", r"reduce|all-reduce"),
    ("gather/scatter", r"gather|scatter|dynamic"),
    ("custom(pallas)", r"custom-call|tpu_custom_call"),
    ("elementwise", r"fusion|add|mul|div|exp|log|max|min|select|compare|convert"),
]


def categorize(name):
    low = name.lower()
    for cat, pat in _CATEGORY_RULES:
        if re.search(pat, low):
            return cat
    return "other"


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
    sync = float(np.asarray(c))
    jax.profiler.stop_trace()
    del sync

    events = load_trace_events(logdir)
    ops, modules, tid_names = device_op_events(events)
    if not ops:
        print("no op-level events found; thread names were:",
              sorted(set(tid_names.values())))
        return

    per_step = 1.0 / args.iters
    total_us = sum(e.get("dur", 0) for e in ops)
    print(f"\n== device op time: {total_us * per_step / 1e3:.3f} ms/step "
          f"({len(ops)} op events over {args.iters} steps) ==")
    for m in {e["name"] for e in modules}:
        durs = [e["dur"] for e in modules if e["name"] == m]
        print(f"  module {m}: n={len(durs)} "
              f"mean={np.mean(durs) / 1e3:.3f} ms")

    by_name = collections.Counter()
    by_count = collections.Counter()
    by_cat = collections.Counter()
    samples = {}
    for e in ops:
        # Collapse the uniquifying suffixes: fusion.123 -> fusion
        base = re.sub(r"[.\d]+$", "", e["name"])
        by_name[base] += e.get("dur", 0)
        by_count[base] += 1
        by_cat[categorize(e["name"])] += e.get("dur", 0)
        src = (e.get("args") or {}).get("source") or \
              (e.get("args") or {}).get("tf_op") or ""
        if base not in samples and src:
            samples[base] = src

    print("\n-- by category (ms/step) --")
    for cat, us in by_cat.most_common():
        print(f"  {cat:18s} {us * per_step / 1e3:8.3f}")

    print(f"\n-- top {args.top} ops (ms/step; n = instances/step) --")
    for name, us in by_name.most_common(args.top):
        src = samples.get(name, "")
        if len(src) > 60:
            src = "..." + src[-57:]
        n = by_count[name] * per_step
        print(f"  {us * per_step / 1e3:8.4f} n={n:5.1f}  "
              f"{name[:60]:60s} {src}")

    if not args.logdir:
        shutil.rmtree(logdir, ignore_errors=True)


if __name__ == "__main__":
    main()
