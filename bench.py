"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: 32x128 LDR->HDR inference throughput (panoramas/s) on one
chip, against the measured reference TF-CPU baseline (see BASELINE.md and
tools/measure_tf_baseline.py). Extra configs (train step, batch-1 latency,
64x256 DA-conv inference + train) ride along in "extras".

Measurement protocol (BASELINE.md "Measurement integrity"):
  * every timing pass uses DISTINCT pre-staged inputs and ends with a HOST
    READ (_host_sync) — identical executions can be served from a
    relay-side cache, and jax.block_until_ready returns early on this
    runtime (a device->host read is the only real barrier);
  * inference/eval iterations are CHAINED through a scalar carry
    (_time_chained) — independent dispatches can be served concurrently,
    which once produced MFU 3.4 on one chip; train steps chain naturally
    through the donated state;
  * samples that violate the compute floor (graph FLOPs at >95% of the
    v5e bf16 peak) are rejected before the cross-repeat MIN is taken
    (_credible_min) — the relay intermittently "executes" a 104-GFLOP
    graph in 0.17 ms, which no amount of chaining prevents;
  * train steps donate the state (undonated state output costs ~1.2 s/step
    in per-buffer overhead on this runtime vs ~90 ms donated);
  * MFU = XLA cost-analysis FLOPs / step time / the dtype-specific v5e peak
    (197 TFLOP/s bf16, 98.5 TFLOP/s f32 — _peak_flops); the compute-floor
    filter uses the same dtype-specific peak;
  * warmup executions are never re-timed (byte-identical executions are
    relay-cacheable).
"""

import json
import os
import sys
import threading
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _log(*args):
    print("[bench]", *args, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# Driver-budget armor (BENCH_r03 postmortem: rc 124, parsed null — the run
# died inside the last stage with the JSON never printed).
#
#   * a persistent XLA compilation cache (same knobs as
#     skyhdr/cli/common.py:apply_runtime_flags) makes repeat invocations skip
#     the 10-60 s remote compiles — the driver's round-end run rides the
#     cache warmed by in-round runs;
#   * all stages run in a DAEMON WORKER THREAD; the main thread joins with a
#     hard wall-clock deadline and, if the worker is still alive (a stalled
#     remote compile cannot be interrupted from Python), prints the JSON from
#     whatever stages completed and os._exit(0)s — the driver ALWAYS gets a
#     parsable line;
#   * stages are budget-gated: each declares a cold-cache cost estimate and
#     is skipped (logged) when the remaining budget cannot cover it;
#   * the headline (inference b32) and the BASELINE.md headline (train bf16
#     b128) run first so they land within the first few minutes even cold.
# ---------------------------------------------------------------------------

BENCH_DEADLINE_S = float(os.environ.get("SKYHDR_BENCH_DEADLINE_S", "900"))
_T_START = time.monotonic()


def _elapsed():
    return time.monotonic() - _T_START


def _tunnel_established(port=8082, proc_paths=("/proc/net/tcp", "/proc/net/tcp6")):
    """True if any ESTABLISHED TCP socket touches `port` (the axon relay's
    local tunnel). During a relay outage the blocked client's 8082 socket
    disappears while the local listener still accepts fresh connects, so
    "deadline hit with no ESTAB 8082" is the outage signature (CLAUDE.md
    "TUNNEL OUTAGE MODE"). Returns None when /proc isn't readable."""
    hexport = ":%04X" % port
    found_any = False
    for path in proc_paths:
        try:
            with open(path) as f:
                lines = f.readlines()[1:]
        except OSError:
            continue
        found_any = True
        for line in lines:
            parts = line.split()
            # sl local_address rem_address st ...
            if len(parts) < 4 or parts[3] != "01":
                continue
            if parts[1].endswith(hexport) or parts[2].endswith(hexport):
                return True
    return False if found_any else None


def _device_roundtrip_probe(timeout_s=75.0):
    """Bounded device liveness check in a SUBPROCESS (a stalled transfer
    cannot be interrupted in-process): device_put + host read, no compile.
    Returns True (alive), False (timed out — the outage signature), or
    None (probe itself broke — unknown, callers must not block on it)."""
    import subprocess
    code = ("import numpy as np, jax\n"
            "x = jax.device_put(np.ones((8,), np.float32))\n"
            "print(float(np.asarray(x).sum()))\n")
    try:
        p = subprocess.run([sys.executable, "-c", code],
                           timeout=timeout_s, capture_output=True)
    except subprocess.TimeoutExpired:
        return False
    except Exception:
        return None
    return True if p.returncode == 0 else None


def _wait_for_tunnel(extras, lock, probe=None, sleep_s=30.0,
                     min_remaining_s=150.0, now=None):
    """Startup outage gate. A dispatch issued while the relay upstream is
    down wedges forever (the blocked client never recovers even after the
    relay returns — CLAUDE.md 'TUNNEL OUTAGE MODE'), so starting stages
    during an outage forfeits the whole artifact. Instead: one bounded
    probe; if it times out, poll until the tunnel returns or only
    `min_remaining_s` of deadline is left (enough for the headline stage),
    then proceed regardless — the deadline watchdog caps the damage either
    way. Healthy-path cost: one ~15-25 s subprocess round-trip."""
    probe = probe or _device_roundtrip_probe
    now = now or time.monotonic
    t0 = now()
    if probe() is not False:
        return True
    _log("startup probe: device round-trip timed out — tunnel outage; "
         "polling instead of wedging the first dispatch")
    with lock:
        extras["tunnel_outage_at_start"] = True
    while _remaining() > min_remaining_s:
        time.sleep(min(sleep_s, max(_remaining() - min_remaining_s, 0.0)))
        r = probe()
        if r is not False:
            waited = round(now() - t0, 1)
            _log(f"tunnel back after {waited}s of startup polling")
            with lock:
                extras["tunnel_recovered_after_s"] = waited
            return True
    _log("tunnel still down with the deadline nearly spent — proceeding "
         "(the watchdog will emit whatever completes)")
    return False


def _remaining():
    return BENCH_DEADLINE_S - _elapsed()


def _enable_compilation_cache():
    """Persistent compile cache (cli/common.py:83-89 equivalent). Opt out
    with SKYHDR_BENCH_CACHE=''; override the directory with the same var."""
    cache = os.environ.get(
        "SKYHDR_BENCH_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".xla_cache"))
    if not cache:
        return
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _log(f"persistent compilation cache at {cache}")
    except Exception as e:  # never let cache plumbing kill the bench
        _log(f"compilation cache unavailable: {type(e).__name__}: {e}")

# Measured on this machine with tools/measure_tf_baseline.py (reference
# inference graph under @tf.function, TF CPU). See BASELINE.md.
TF_CPU_BASELINE_INFER_32x128 = 26.05  # panoramas/s, batch 32

V5E_PEAK_FLOPS = 197e12  # bf16 peak per chip (MXU); f32 runs at half


def _peak_flops(compute_dtype: str) -> float:
    """Nominal MXU peak for the config's compute dtype. f32 configs use the
    half-rate peak so (a) reported MFU is relative to what the dtype can
    reach and (b) the relay-fiction floor is not 2x too permissive for f32
    (a sample at 50-95% of the bf16 peak is physically impossible in f32)."""
    return V5E_PEAK_FLOPS if compute_dtype == "bfloat16" else V5E_PEAK_FLOPS / 2


def _host_sync(x):
    """TRUE synchronization: a host read of one element.

    jax.block_until_ready LIES on this tunneled runtime — a 40-step scanned
    inference chain 'completed' in 0.3 ms under block_until_ready but took
    the physically-consistent 264 ms when a float() host read followed
    (BASELINE.md "Measurement integrity"). Only a device->host read is a
    real barrier here. The device executes serially, so syncing the LAST
    result syncs everything before it."""
    import numpy as _np

    leaf = jax.tree_util.tree_leaves(x)[-1]
    return float(_np.asarray(leaf).ravel()[0])


def _time_over_inputs(fn, inputs, warmup=2):
    """Time fn over DISTINCT pre-staged inputs; host-read barrier at end.

    Warmup inputs are EXCLUDED from the timed set: a timed execution that is
    byte-identical to a warmup execution can be served from the relay-side
    result cache (the failure mode this whole protocol exists to defeat)."""
    for x in inputs[:warmup]:
        _host_sync(fn(x))
    timed = inputs[warmup:]
    t0 = time.perf_counter()
    outs = [fn(x) for x in timed]
    _host_sync(outs[-1])
    return (time.perf_counter() - t0) / len(timed)


def _time_chained(step, inputs, warmup=1):
    """Time a carry-threading step over DISTINCT inputs.

    step(carry, x) -> carry must make iteration k+1 data-dependent on
    iteration k (e.g. add a zero-scaled scalar of the output into the next
    input). Independent dispatches through the tunnel can be served
    CONCURRENTLY (a distinct-input pipelined loop once measured MFU 3.4 —
    physically impossible on one chip), so only a dependency chain measures
    per-chip step time. The train benches get this for free from state
    donation; inference/eval must thread a carry explicitly. Warmup inputs
    are excluded from the timed set (the zero carry would make the first
    timed execution byte-identical to its warmup and relay-cacheable)."""
    carry = jnp.zeros((), jnp.float32)
    for x in inputs[:warmup]:
        carry = step(carry, x)
    _host_sync(carry)
    timed = inputs[warmup:]
    t0 = time.perf_counter()
    for x in timed:
        carry = step(carry, x)
    _host_sync(carry)
    return (time.perf_counter() - t0) / len(timed)


def _credible_min(times, flops, peak=V5E_PEAK_FLOPS, mfu_cap=0.95):
    """Min over samples that do not violate the compute floor.

    The relay intermittently returns results faster than the chip can
    compute them AT ALL (measured 0.17 ms for a 104-GFLOP graph on a chip
    that calibrates at 61-88 TF/s on dense matmuls — implied MFU 3.4; the
    same graph honestly measures 9-11 ms minutes later). A min over raw
    samples amplifies that fiction, so samples below flops/(cap*peak) are
    rejected. `peak` is the dtype-specific MXU peak (_peak_flops).
    Returns (dt, n_rejected); if every sample is impossible the
    slowest one is used."""
    if not flops:
        return min(times), 0
    floor = flops / (mfu_cap * peak)
    credible = [t for t in times if t >= floor]
    if not credible:
        return max(times), len(times)
    return min(credible), len(times) - len(credible)


@partial(jax.jit, static_argnums=(1, 2, 3))
def _device_uniform(key, shape, lo=0.0, hi=1.0):
    """Bench inputs are generated ON DEVICE: the tunnel moves host arrays at
    ~6 MB/s (measured 2026-08-19: a 31 MB stack took 5.0 s to put), so
    host-built input stacks dominated stage wall-clock. Distinct PRNG keys
    per stack keep every execution byte-distinct (relay-cache-proof); the
    generation itself is synced before any timing starts."""
    return jax.random.uniform(key, shape, jnp.float32, lo, hi)


def _sync_scalar(x):
    """Barrier on a device array WITHOUT pulling it to the host: index one
    element on device (serial execution ⇒ its completion implies the whole
    producer finished) and host-read only that scalar. _host_sync(x) would
    np.asarray the full leaf — a 31 MB device->host pull at ~35 MB/s."""
    return _host_sync(x.ravel()[0] if hasattr(x, "ravel") else x)


def _graph_flops(jitted, *args):
    """XLA's own FLOP count for the compiled graph (per execution)."""
    try:
        lowered = jitted.lower(*args)
    except Exception as e:  # pragma: no cover - depends on backend support
        _log(f"  lowering for cost_analysis failed: {type(e).__name__}")
        return 0.0
    for get in (lowered.cost_analysis,
                lambda: lowered.compile().cost_analysis()):
        try:
            cost = get()
            if isinstance(cost, list):  # older jax returns [dict]
                cost = cost[0]
            if cost and cost.get("flops"):
                return float(cost["flops"])
        except Exception:
            continue
    _log("  cost_analysis unavailable on this backend")
    return 0.0


def bench_inference(cfg, batch, iters=20, repeats=3, weights_dtype=None):
    from skyhdr.train.engine import create_gan_state, make_inference_fn
    from skyhdr.utils.params import cast_model_vars

    state = create_gan_state(cfg, jax.random.PRNGKey(0))
    if weights_dtype is not None:
        # bf16-weight serving: halves the HBM weight-streaming bytes (the
        # 64x256 config's sunpose FCs alone are 3.2 GB f32 — BASELINE.md).
        state = state.replace(
            gen_vars=cast_model_vars(state.gen_vars, weights_dtype),
            sun_vars=cast_model_vars(state.sun_vars, weights_dtype))
    infer = make_inference_fn(cfg, jit=False)
    shape = (batch, cfg.model.im_height, cfg.model.im_width, 3)

    # Params as explicit jit args: closing over them would capture every
    # weight as a graph constant (3.2 GB at the 64x256 DA config — the
    # reference's sunpose FCs are h*w wide, sunpose_net.py:36).
    #
    # The timed loop is a lax.scan chain: iterations serialize through the
    # carry (every integrity rule of _time_chained holds — distinct stacked
    # inputs, a dependency chain, one host-read barrier) but the host
    # dispatches ONE execution, so the measurement is the chip's step rate.
    # Per-call dispatch on this tunneled runtime costs ~1-8 ms/call
    # (scales with argument bytes: profiler-measured 45.8 ms device vs
    # ~54 ms per-call wall at the 64x256 DA config whose params are
    # 3.2 GB) — that relay-marshaling artifact is reported separately as
    # dispatch_ms_per_call.
    @jax.jit
    def step(carry, gv, sv, x):
        out = infer(gv, sv, x + carry)["y_final_lin"]
        # Full-reduction carry: a first-element consumer would let XLA DCE
        # the output epilogue (unpack relayout, log-decompression) — ~2 ms
        # of real work once vanished under a partial consumer at the 64x256
        # DA shape (tools/bench_daconv.py protocol note).
        return jnp.sum(out) * 0.0

    @jax.jit
    def chain(gv, sv, xs):
        def body(c, x):
            return step(c, gv, sv, x), ()
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), xs)
        return c

    def make_stack(r):
        return _device_uniform(jax.random.PRNGKey(1000 + r), (iters,) + shape)

    peak = _peak_flops(cfg.model.compute_dtype)
    flops = _graph_flops(step, jnp.zeros((), jnp.float32),
                         state.gen_vars, state.sun_vars,
                         jnp.zeros(shape, jnp.float32))
    floor = flops / (0.95 * peak) if flops else 0.0

    # Warmup/compile on its own input stack (never re-timed: byte-identical
    # re-executions are relay-cacheable).
    _host_sync(chain(state.gen_vars, state.sun_vars, make_stack(999)))

    times = []
    for r in range(2 * repeats):  # extra rounds only if every sample so
        if r >= repeats and any(t >= floor for t in times):
            break                 # far violates the compute floor
        xs = make_stack(r)
        _sync_scalar(xs)
        t0 = time.perf_counter()
        c = chain(state.gen_vars, state.sun_vars, xs)
        _host_sync(c)
        times.append((time.perf_counter() - t0) / iters)
    dt, suspect = _credible_min(times, flops, peak)

    # Per-call dispatch overhead: one extra pass dispatched step-by-step.
    per_call = _time_chained(
        lambda c, x: step(c, state.gen_vars, state.sun_vars, x),
        [_device_uniform(jax.random.PRNGKey(7000 + i), shape)
         for i in range(5)])

    return {
        "panoramas_per_s": batch / dt,
        "ms": dt * 1e3,
        "spread_ms": [round(t * 1e3, 3) for t in times],
        "mfu": flops / dt / peak if flops else None,
        "relay_suspect_samples": suspect,
        "dispatch_ms_per_call": round(max(per_call * 1e3 - dt * 1e3, 0.0), 3),
    }


def bench_train_step(cfg, iters=12, repeats=3):
    from skyhdr.data.degradation import make_banks
    from skyhdr.models.vgg16 import random_vgg16_weights
    from skyhdr.train.engine import create_gan_state, make_gan_train_step
    from skyhdr.utils.io import get_exposure_lists, make_synthetic_dorf

    banks = make_banks(make_synthetic_dorf(175, 1024),
                       get_exposure_lists()[0])
    step = make_gan_train_step(cfg, banks, random_vgg16_weights(), jit=False)
    step = jax.jit(step, donate_argnums=(0,))
    b = cfg.data.batch_size
    shape = (b, cfg.model.im_height, cfg.model.im_width, 3)

    def one_pass(r):
        state = create_gan_state(cfg, jax.random.PRNGKey(r))
        hdrs = _device_uniform(
            jax.random.PRNGKey(2000 + r), (iters,) + shape, 0.0, 2.0)
        elev = jnp.asarray(np.linspace(4, 28, b).astype(np.float32) + r)
        batches = [{"hdr": hdrs[i], "elevation": elev + 0.01 * i}
                   for i in range(iters)]
        _sync_scalar(batches[-1]["hdr"])
        keys = jax.random.split(jax.random.PRNGKey(100 + r), iters)
        # Warmup (also threads state so no step can be a cached replay).
        state, m0 = step(state, batches[0], keys[0])
        _host_sync(m0["gen_total"])
        t0 = time.perf_counter()
        for bt, k in zip(batches, keys):
            state, metrics = step(state, bt, k)
        _host_sync(metrics["gen_total"])
        return (time.perf_counter() - t0) / iters

    times = [one_pass(r) for r in range(repeats)]

    # FLOPs of the whole train step (fwd+bwd+updates), from XLA.
    from skyhdr.train.engine import create_gan_state as _cgs
    st = _cgs(cfg, jax.random.PRNGKey(9))
    flops = _graph_flops(
        step, st,
        {"hdr": jnp.zeros(shape, jnp.float32),
         "elevation": jnp.zeros((b,), jnp.float32)},
        jax.random.PRNGKey(0),
    )
    peak = _peak_flops(cfg.model.compute_dtype)
    dt, suspect = _credible_min(times, flops, peak)
    return {
        "panoramas_per_s": b / dt,
        "ms": dt * 1e3,
        "spread_ms": [round(t * 1e3, 3) for t in times],
        "mfu": flops / dt / peak if flops else None,
        "relay_suspect_samples": suspect,
    }


def bench_sun_train_step(cfg, iters=12, repeats=3):
    """pretrain_sun config (BASELINE.json config 2): sun-pose train step."""
    from skyhdr.data.degradation import make_banks
    from skyhdr.train.engine import create_sun_state, make_sun_train_step
    from skyhdr.utils.io import get_exposure_lists, make_synthetic_dorf

    banks = make_banks(make_synthetic_dorf(175, 1024), get_exposure_lists()[0])
    step = make_sun_train_step(cfg, banks, jit=False)
    step = jax.jit(step, donate_argnums=(0,))
    b = cfg.data.batch_size
    shape = (b, cfg.model.im_height, cfg.model.im_width, 3)

    def one_pass(r):
        state = create_sun_state(cfg, jax.random.PRNGKey(r))
        hdrs = _device_uniform(
            jax.random.PRNGKey(3000 + r), (iters,) + shape, 0.0, 2.0)
        elev = jnp.asarray(np.linspace(4, 28, b).astype(np.float32) + r)
        batches = [{"hdr": hdrs[i], "elevation": elev + 0.01 * i}
                   for i in range(iters)]
        _sync_scalar(batches[-1]["hdr"])
        keys = jax.random.split(jax.random.PRNGKey(200 + r), iters)
        state, m0 = step(state, batches[0], keys[0])
        _host_sync(m0["sun_total"])
        t0 = time.perf_counter()
        for bt, k in zip(batches, keys):
            state, metrics = step(state, bt, k)
        _host_sync(metrics["sun_total"])
        return (time.perf_counter() - t0) / iters

    times = [one_pass(r) for r in range(repeats)]
    dt = min(times)
    return {"panoramas_per_s": b / dt, "ms": dt * 1e3,
            "spread_ms": [round(t * 1e3, 3) for t in times], "mfu": None}


def bench_eval_pipeline(cfg, iters=12, repeats=3):
    """Batched eval pipeline (BASELINE.json config 5): degrade -> reconstruct
    -> PSNR/si-RMSE/EMD metrics, one jitted graph per batch."""
    from skyhdr.data.degradation import degrade_batch, make_banks
    from skyhdr.train.engine import create_gan_state, make_inference_fn
    from skyhdr.train.evaluation import evaluate_batch
    from skyhdr.utils.io import get_exposure_lists, make_synthetic_dorf

    banks = make_banks(make_synthetic_dorf(26, 1024), get_exposure_lists()[1])
    state = create_gan_state(cfg, jax.random.PRNGKey(0))
    infer = make_inference_fn(cfg, jit=False)
    b = cfg.data.batch_size
    shape = (b, cfg.model.im_height, cfg.model.im_width, 3)

    def eval_one(carry, key, hdr):
        hdr_t, ldr = degrade_batch(key, hdr + carry, banks)
        pred = infer(state.gen_vars, state.sun_vars, ldr)["y_final_lin"]
        m = evaluate_batch(pred, hdr_t)
        # Chain iterations through a FULL reduction of every metric leaf —
        # a psnr-only carry lets XLA DCE the si-RMSE and EMD computations,
        # and this stage advertises all three.
        total = sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(m))
        return total * 0.0

    # Scan chain (see bench_inference): serialized on device through the
    # carry, dispatched once — measures the chip, not per-call marshaling.
    @jax.jit
    def chain(keys, hdrs):
        def body(c, kh):
            return eval_one(c, *kh), ()
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), (keys, hdrs))
        return c

    def make_stack(r):
        keys = jax.random.split(jax.random.PRNGKey(300 + r), iters)
        return keys, _device_uniform(
            jax.random.PRNGKey(4000 + r), (iters,) + shape, 0.0, 2.0)

    _host_sync(chain(*make_stack(999)))
    times = []
    for r in range(repeats):
        keys, hdrs = make_stack(r)
        _sync_scalar(hdrs)
        t0 = time.perf_counter()
        c = chain(keys, hdrs)
        _host_sync(c)
        times.append((time.perf_counter() - t0) / iters)
    dt = min(times)
    return {"panoramas_per_s": b / dt, "ms": dt * 1e3,
            "spread_ms": [round(t * 1e3, 3) for t in times], "mfu": None}


# BASELINE.md records (ms/step) for the regression sentinel: a stage
# landing >2x its record is flagged in extras["regressed_vs_baseline"] so a
# degraded judged artifact carries its own red flag (the r4 bench regressed
# 13x on train_step_bf16_b32 and nothing in the JSON said so).
BASELINE_STAGE_MS = {
    "inference_b32": 4.79,
    "train_step_bf16_b128": 28.6,
    "da_conv_64x256_train_b64": 261.0,
    "train_step_b32": 16.8,
    "train_step_bf16_b32": 14.5,
    "sun_train_step_b32": 7.92,
    "inference_bf16_b32": 4.35,
    "inference_b1": 1.4,
    "eval_pipeline_b32": 6.84,
    "da_conv_64x256_infer_b32": 33.8,
    "da_conv_64x256_infer_b32_bf16w": 30.6,
    "train_step_bf16_b256": 75.4,
}


class StageRunner:
    """Budget-gated stage driver with incremental, lock-guarded publishing.

    All mutation of result/extras goes through `self.lock`; the deadline
    watchdog snapshots under the same lock, so the final JSON line can never
    hit 'dictionary changed size during iteration' mid-dumps (ADVICE r4).
    Failure forensics (VERDICT r4 item 2): the exception text is persisted
    per stage in extras["failed_stage_errors"], a failed stage is retried
    once when the budget allows, and a stage landing >2x its BASELINE.md
    record is flagged in extras["regressed_vs_baseline"]."""

    def __init__(self, result, remaining=None, baseline_ms=None,
                 tf_cpu_baseline=None):
        self.result = result
        self.extras = result["extras"]
        self.lock = threading.Lock()
        self.remaining = remaining or _remaining
        self.baseline_ms = (BASELINE_STAGE_MS if baseline_ms is None
                            else baseline_ms)
        self.tf_cpu_baseline = tf_cpu_baseline or TF_CPU_BASELINE_INFER_32x128
        self.stage_times = []  # wall per completed stage (adaptive gating)

    def _append(self, listkey, value):
        with self.lock:
            self.extras.setdefault(listkey, []).append(value)

    def snapshot(self):
        """Deep-enough copy for json.dumps while stages keep publishing."""
        with self.lock:
            out = dict(self.result)
            out["extras"] = {
                k: (list(v) if isinstance(v, list)
                    else dict(v) if isinstance(v, dict) else v)
                for k, v in self.extras.items()}
        return out

    def run(self, name, key, fn, est_s, is_headline=False):
        import gc

        # Adaptive budget gate: once two stages have completed, the expected
        # cost of the next is min(cold estimate, 2x the slowest observed) —
        # a warm compilation cache makes every stage far cheaper than its
        # cold estimate, and the gate should not skip stages that fit.
        est = est_s
        if len(self.stage_times) >= 2:
            est = min(est_s, max(60.0, 2.0 * max(self.stage_times)))
        # The headline is always attempted — the watchdog caps the damage,
        # and a tried-but-truncated headline beats a reported 0.
        if not is_headline and self.remaining() < est + 45.0:
            _log(f"{name}: SKIPPED (remaining {self.remaining():.0f}s < "
                 f"est {est:.0f}s + 45s emission headroom)")
            self._append("skipped_stages", key)
            return None
        res = None
        for attempt in range(2):
            _log(f"{name} ... (elapsed {_elapsed():.0f}s)"
                 + (" [retry]" if attempt else ""))
            t0 = time.monotonic()
            try:
                res = fn()
                break
            except Exception as e:
                err = f"{type(e).__name__}: {e}"
                _log(f"  FAILED: {err}")
                with self.lock:
                    self.extras.setdefault("failed_stage_errors", {})[key] = err
                # Retry once when the budget still covers the stage — r4
                # lost two judged stages to single transient failures.
                if attempt == 0 and self.remaining() >= est + 45.0:
                    continue
                self._append("failed_stages", key)
                return None
        if attempt:
            self._append("retried_ok_stages", key)
        self.stage_times.append(time.monotonic() - t0)
        _log(f"  {res['panoramas_per_s']:.1f} pano/s "
             f"(min {res['ms']:.2f} ms over {res['spread_ms']})"
             + (f", mfu {res['mfu']:.3f}" if res.get("mfu") else "")
             + f"  [stage {self.stage_times[-1]:.0f}s]")
        gc.collect()
        # Publish incrementally so the deadline watchdog always prints the
        # freshest completed set.
        pub = {
            f"{key}_panoramas_per_s": round(res["panoramas_per_s"], 2),
            f"{key}_ms": round(res["ms"], 3),
            f"{key}_spread_ms": res["spread_ms"],
        }
        if res.get("mfu"):
            pub[f"{key}_mfu"] = round(res["mfu"], 4)
        if res.get("relay_suspect_samples"):
            pub[f"{key}_relay_suspect_samples"] = res["relay_suspect_samples"]
        if res.get("dispatch_ms_per_call") is not None:
            pub[f"{key}_dispatch_ms_per_call"] = res["dispatch_ms_per_call"]
        with self.lock:
            self.extras.update(pub)
            if is_headline:
                tput = res["panoramas_per_s"]
                self.result["value"] = round(tput, 2)
                self.result["vs_baseline"] = round(
                    tput / self.tf_cpu_baseline, 2)
        base = self.baseline_ms.get(key)
        if base and res["ms"] > 2.0 * base:
            _log(f"  REGRESSION: {res['ms']:.2f} ms vs BASELINE.md record "
                 f"{base:.2f} ms (> 2x)")
            self._append("regressed_vs_baseline", key)
        return res


def _run_stages(runner):
    """Worker-thread body: run budget-gated stages through `runner`, which
    publishes into the shared result dict after EVERY stage."""
    from skyhdr.config import Config, DataConfig, ModelConfig

    extras = runner.extras
    run = runner.run

    extras["device"] = str(jax.devices()[0])
    extras["tf_cpu_baseline_infer_32x128_b32"] = TF_CPU_BASELINE_INFER_32x128
    # MFU denominators are dtype-specific (_peak_flops): f32 configs use the
    # half-rate peak so their MFU is relative to what f32 can reach.
    extras["mfu_peak_flops_bf16"] = V5E_PEAK_FLOPS
    extras["mfu_peak_flops_f32"] = V5E_PEAK_FLOPS / 2

    cfg = Config()
    cfg_bf16 = Config(model=ModelConfig(compute_dtype="bfloat16"))
    cfg_bf16_b128 = Config(model=ModelConfig(compute_dtype="bfloat16"),
                           data=DataConfig(batch_size=128))
    cfg64 = Config(model=ModelConfig(im_height=64, im_width=256,
                                     use_da_conv=True),
                   data=DataConfig(batch_size=32))
    cfg64_bf16 = Config(model=ModelConfig(im_height=64, im_width=256,
                                          use_da_conv=True,
                                          compute_dtype="bfloat16"),
                        data=DataConfig(batch_size=32))

    # Headline first (driver metric), then the BASELINE.md headline — both
    # inside the first ~5 minutes even on a cold cache.
    run("inference 32x128 b32", "inference_b32",
        lambda: bench_inference(cfg, 32), est_s=170, is_headline=True)
    run("train step 32x128 b128 bf16", "train_step_bf16_b128",
        lambda: bench_train_step(cfg_bf16_b128, iters=8), est_s=220)
    # The scale-up train config (VERDICT r3 item 2 evidence) runs THIRD:
    # in two consecutive full runs a single relay stall early on pushed the
    # tail stages past the deadline gate — the three judged numbers must
    # all land before any stall can eat the budget. b64 is the
    # measured-best train batch here (2026-08-19 probes: b8 57.7 ms/139
    # pano/s/MFU 0.117, b16 85.9/186/0.157, b32 144.1/222/0.187, b64
    # 260.9/245/0.206 — step ~= 29.3 ms + 3.53 ms/sample; the constant is
    # RMSprop/param HBM traffic, see BASELINE.md). repeats=4 with the min
    # taken across passes: the first pass after the big 64x256 compiles
    # has measured 1.8x contaminated (BENCH_r02 spread [133, 75]).
    run("DA-conv train step 64x256 b64", "da_conv_64x256_train_b64",
        lambda: bench_train_step(
            Config(model=ModelConfig(im_height=64, im_width=256,
                                     use_da_conv=True),
                   data=DataConfig(batch_size=64)),
            iters=6, repeats=4), est_s=320)

    # f32 train next while HBM is still mostly clean (leftover buffers have
    # pushed the f32 step into a bimodal spill regime before).
    run("train step 32x128 b32", "train_step_b32",
        lambda: bench_train_step(cfg), est_s=180)
    run("train step 32x128 b32 bf16", "train_step_bf16_b32",
        lambda: bench_train_step(cfg_bf16), est_s=170)
    run("sun-pretrain step 32x128 b32", "sun_train_step_b32",
        lambda: bench_sun_train_step(cfg), est_s=140)
    run("inference 32x128 b32 bf16", "inference_bf16_b32",
        lambda: bench_inference(cfg_bf16, 32), est_s=140)
    run("inference 32x128 b1", "inference_b1",
        lambda: bench_inference(cfg, 1, iters=50), est_s=140)
    run("eval pipeline 32x128 b32", "eval_pipeline_b32",
        lambda: bench_eval_pipeline(cfg), est_s=150)

    # Scale-up (64x256 DA) configs: the expensive compiles live here, at the
    # tail, where a budget overrun costs extra stages rather than the record.
    run("DA-conv inference 64x256 b32", "da_conv_64x256_infer_b32",
        lambda: bench_inference(cfg64, 32, iters=20), est_s=240)
    # bf16 compute + bf16 stored weights (skyhdr.utils.params.cast_model_vars):
    # the serving config — halves both the h*w-wide sunpose FC streaming
    # (3.2 GB f32 at this shape) and the conv compute. The bf16c-only stage
    # from r03 was dropped: bf16c+bf16w dominates it (30.46 vs 30.76 ms) and
    # the driver budget is better spent on the train configs below.
    run("DA-conv inference 64x256 b32 bf16c+bf16w",
        "da_conv_64x256_infer_b32_bf16w",
        lambda: bench_inference(cfg64_bf16, 32, iters=20,
                                weights_dtype="bfloat16"), est_s=240)
    # Large-batch probe: MFU climbed 0.166 -> 0.324 from b32 -> b128; does
    # b256 continue the climb or hit an HBM/latency wall? (VERDICT r3 #7)
    run("train step 32x128 b256 bf16", "train_step_bf16_b256",
        lambda: bench_train_step(
            Config(model=ModelConfig(compute_dtype="bfloat16"),
                   data=DataConfig(batch_size=256)), iters=6), est_s=220)

    with runner.lock:
        runner.result["_done"] = True


def main():
    _enable_compilation_cache()
    result = {
        "metric": "inference_throughput_32x128_b32",
        "value": 0.0,
        "unit": "panoramas/s",
        "vs_baseline": 0.0,
        "extras": {},
    }
    runner = StageRunner(result)
    if os.environ.get("SKYHDR_BENCH_STARTUP_PROBE", "1") not in ("", "0"):
        _wait_for_tunnel(result["extras"], runner.lock)
    worker = threading.Thread(target=_run_stages, args=(runner,), daemon=True)
    worker.start()
    worker.join(timeout=max(BENCH_DEADLINE_S - _elapsed(), 1.0))
    if worker.is_alive():
        _log(f"DEADLINE ({BENCH_DEADLINE_S:.0f}s) hit with a stage still "
             f"running — emitting partial results")
        with runner.lock:
            result["extras"]["deadline_hit"] = True
        # Self-explaining degraded artifact: a stall with the relay's 8082
        # socket gone is the documented tunnel outage, not a code regression
        # (four such events on 2026-08-20 alone).
        if _tunnel_established() is False:
            _log("no ESTABLISHED relay socket on :8082 — tunnel outage "
                 "suspected (see CLAUDE.md 'TUNNEL OUTAGE MODE')")
            with runner.lock:
                result["extras"]["tunnel_outage_suspected"] = True
    with runner.lock:
        result["extras"]["bench_wall_s"] = round(_elapsed(), 1)
    out = runner.snapshot()
    out.pop("_done", None)
    print(json.dumps(out), flush=True)
    # Skip interpreter teardown: the tunneled backend's atexit hooks can
    # stall, and a stalled daemon thread must not keep the process alive.
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
