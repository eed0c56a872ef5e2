"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: 32x128 LDR->HDR inference throughput (panoramas/s) on one
chip, against the measured reference TF-CPU baseline (see BASELINE.md and
tools/measure_tf_baseline.py). Extra configs (train step, batch-1 latency,
64x256) ride along in "extras".
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _log(*args):
    print("[bench]", *args, file=sys.stderr, flush=True)

# Measured on this machine with tools/measure_tf_baseline.py (reference
# inference graph under @tf.function, TF CPU). See BASELINE.md.
TF_CPU_BASELINE_INFER_32x128 = 26.05  # panoramas/s, batch 32


def _time_over_inputs(fn, inputs, warmup=2):
    """Time fn over DISTINCT pre-staged inputs, blocking on every output.

    Timing with one input reused across iterations is invalid on this
    tunneled runtime: repeated identical executions can return relay-cached
    results, reporting physically impossible step times (measured: 0.1 ms
    for a graph whose true device time is 84 ms)."""
    for x in inputs[:warmup]:
        jax.block_until_ready(fn(x))
    t0 = time.perf_counter()
    outs = [fn(x) for x in inputs]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / len(inputs)


def bench_inference(cfg, batch, iters=20):
    from skyhdr.train.engine import create_gan_state, make_inference_fn

    state = create_gan_state(
        cfg.replace(data=cfg.data), jax.random.PRNGKey(0)
    )
    infer = make_inference_fn(cfg)
    rng = np.random.default_rng(0)
    shape = (batch, cfg.model.im_height, cfg.model.im_width, 3)
    inputs = [jnp.asarray(rng.uniform(0, 1, size=shape).astype(np.float32))
              for _ in range(iters)]
    jax.block_until_ready(inputs)
    dt = _time_over_inputs(
        lambda x: infer(state.gen_vars, state.sun_vars, x)["y_final_lin"],
        inputs,
    )
    return batch / dt, dt


def bench_train_step(cfg, iters=12):
    from skyhdr.data.degradation import make_banks
    from skyhdr.models.vgg16 import random_vgg16_weights
    from skyhdr.train.engine import create_gan_state, make_gan_train_step
    from skyhdr.utils.io import get_exposure_lists, make_synthetic_dorf

    banks = make_banks(make_synthetic_dorf(175, 1024),
                       get_exposure_lists()[0])
    step = make_gan_train_step(cfg, banks, random_vgg16_weights(), jit=False)
    # Donate the state like production training (skyhdr.train.loop) does:
    # on this runtime an undonated state output costs ~1.2 s/step in
    # per-buffer overhead vs ~90 ms donated.
    step = jax.jit(step, donate_argnums=(0,))
    state = create_gan_state(cfg, jax.random.PRNGKey(0))
    b = cfg.data.batch_size
    rng = np.random.default_rng(0)
    batches = [{
        "hdr": jnp.asarray(rng.uniform(0, 2, size=(b, cfg.model.im_height,
                                                   cfg.model.im_width, 3)
                                       ).astype(np.float32)),
        "elevation": jnp.asarray(np.linspace(4, 28, b).astype(np.float32)),
    } for _ in range(iters)]
    jax.block_until_ready(batches)
    keys = jax.random.split(jax.random.PRNGKey(1), iters)

    # Warmup (also threads state so no step can be a cached replay).
    state, _ = step(state, batches[0], keys[0])
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for bt, k in zip(batches, keys):
        state, metrics = step(state, bt, k)
    jax.block_until_ready(metrics["gen_total"])
    dt = (time.perf_counter() - t0) / iters
    return b / dt, dt


def main():
    import gc

    from skyhdr.config import Config, DataConfig, ModelConfig

    cfg = Config()

    # Train benches run first on a clean HBM (leftover buffers from other
    # stages have pushed the f32 step into a spill regime before).
    _log("train step 32x128 b32 ...")
    train_tput, train_dt = bench_train_step(cfg)
    _log(f"  {train_tput:.1f} pano/s")
    gc.collect()
    _log("train step 32x128 b32 bf16 ...")
    cfg_bf16 = Config(model=ModelConfig(compute_dtype="bfloat16"))
    train16_tput, train16_dt = bench_train_step(cfg_bf16)
    _log(f"  {train16_tput:.1f} pano/s")
    gc.collect()

    _log("inference 32x128 b32 ...")
    infer_tput, infer_dt = bench_inference(cfg, batch=32)
    _log(f"  {infer_tput:.1f} pano/s")
    gc.collect()
    _log("inference 32x128 b1 ...")
    infer1_tput, infer1_dt = bench_inference(cfg, batch=1, iters=50)
    _log(f"  {infer1_tput:.1f} pano/s")
    gc.collect()

    cfg64 = Config(model=ModelConfig(im_height=64, im_width=256,
                                     use_da_conv=True),
                   data=DataConfig(batch_size=32))
    _log("DA-conv inference 64x256 b32 ...")
    da_tput, da_dt = bench_inference(cfg64, batch=32, iters=20)
    _log(f"  {da_tput:.1f} pano/s")

    vs = infer_tput / TF_CPU_BASELINE_INFER_32x128
    result = {
        "metric": "inference_throughput_32x128_b32",
        "value": round(infer_tput, 2),
        "unit": "panoramas/s",
        "vs_baseline": round(vs, 2),
        "extras": {
            "inference_ms_b32": round(infer_dt * 1e3, 3),
            "inference_b1_panoramas_per_s": round(infer1_tput, 2),
            "inference_b1_ms": round(infer1_dt * 1e3, 3),
            "train_step_panoramas_per_s_b32": round(train_tput, 2),
            "train_step_ms_b32": round(train_dt * 1e3, 3),
            "train_step_bf16_panoramas_per_s_b32": round(train16_tput, 2),
            "train_step_bf16_ms_b32": round(train16_dt * 1e3, 3),
            "da_conv_64x256_infer_panoramas_per_s_b32": round(da_tput, 2),
            "tf_cpu_baseline_infer_32x128_b32": TF_CPU_BASELINE_INFER_32x128,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
