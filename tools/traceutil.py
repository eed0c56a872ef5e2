"""Shared jax.profiler trace parsing for the profile_* tools.

The vm trace's op-level track (thread name matching 'XLA Op' / 'TensorFlow
Op') carries per-op durations with `source`/`tf_op` attribution; the module
track's mean duration is the ground-truth step time (CLAUDE.md: wall clock
over the tunnel includes multi-ms dispatch). The `while` wrapper row in the
op table covers the whole scan body — don't double count it.
"""

import collections
import glob
import gzip
import json
import os
import re

import numpy as np


def load_trace_events(logdir):
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no trace under {logdir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    return data["traceEvents"]


def device_op_events(events):
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


def report(ops, modules, iters, top=30, out=print):
    per_step = 1.0 / iters
    total_us = sum(e.get("dur", 0) for e in ops)
    out(f"\n== device op time: {total_us * per_step / 1e3:.3f} ms/step "
        f"({len(ops)} op events over {iters} steps) ==")
    for m in {e["name"] for e in modules}:
        durs = [e["dur"] for e in modules if e["name"] == m]
        out(f"  module {m}: n={len(durs)} mean={np.mean(durs) / 1e3:.3f} ms")

    # Group by (base name, source line): a bare base-name key would lump
    # every unnamed `fusion.NNN` in the module under one row labeled with
    # the FIRST instance's source — which once misattributed 5 ms of conv
    # backward work to the degradation pipeline.
    by_key = collections.Counter()
    by_count = collections.Counter()
    by_cat = collections.Counter()
    for e in ops:
        base = re.sub(r"[.\d]+$", "", e["name"])
        src = (e.get("args") or {}).get("source") or \
              (e.get("args") or {}).get("tf_op") or ""
        key = (base, src)
        by_key[key] += e.get("dur", 0)
        by_count[key] += 1
        by_cat[categorize(e["name"])] += e.get("dur", 0)

    out("\n-- by category (ms/step) --")
    for cat, us in by_cat.most_common():
        out(f"  {cat:18s} {us * per_step / 1e3:8.3f}")

    out(f"\n-- top {top} (op, source) groups (ms/step; n = instances/step) --")
    for (name, src), us in by_key.most_common(top):
        if len(src) > 60:
            src = "..." + src[-57:]
        n = by_count[(name, src)] * per_step
        out(f"  {us * per_step / 1e3:8.4f} n={n:5.1f}  {name[:45]:45s} {src}")


def report_instances(ops, iters, top=30, out=print):
    """Per-HLO-instance totals with tf_op attribution (exact names kept)."""
    agg = collections.Counter()
    cnt = collections.Counter()
    args_of = {}
    for e in ops:
        agg[e["name"]] += e.get("dur", 0)
        cnt[e["name"]] += 1
        args_of.setdefault(e["name"], e.get("args") or {})
    out(f"\n-- top {top} instances (us/step) --")
    for name, us in agg.most_common(top):
        a = args_of[name]
        tf_op = str(a.get("tf_op", ""))[-80:]
        flops = a.get("model_flops", "0")
        out(f"  {us / iters:9.1f} n={cnt[name] / iters:4.1f} "
            f"flops={flops:>12s}  {name[:30]:30s} {tf_op}")
