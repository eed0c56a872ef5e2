"""Chunked train-step dispatch experiment (TrainLoop.steps_per_dispatch).

Question: does scanning N train steps in ONE jitted dispatch — with the
chunk of batches stacked ON HOST and uploaded once — beat the production
per-step path (per-batch host upload + per-step dispatch, pipelined)?

Round-3 context: the first chunking attempt stacked the batches on DEVICE
(after N separate uploads) and measured NO win — the per-step path already
pipelines dispatches, so only the per-batch TRANSFER cost is addressable.
This experiment isolates that: same GAN step, same number of optimizer
updates, host-resident inputs either fed per step or np.stack-ed per chunk.

Run on the real TPU: python tools/exp_chunk.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from skyhdr.config import Config
from skyhdr.data.degradation import make_banks
from skyhdr.models.vgg16 import random_vgg16_weights
from skyhdr.train.engine import create_gan_state, make_gan_train_step
from skyhdr.utils.io import get_exposure_lists, make_synthetic_dorf


def _host_sync(x):
    return float(jnp.asarray(x).ravel()[0])


def main():
    cfg = Config()
    b = cfg.data.batch_size
    shape = (b, cfg.model.im_height, cfg.model.im_width, 3)
    banks = make_banks(make_synthetic_dorf(175, 1024),
                       get_exposure_lists()[0])
    step = make_gan_train_step(cfg, banks, random_vgg16_weights(), jit=False)
    jstep = jax.jit(step, donate_argnums=(0,))

    N = 64
    rng = np.random.default_rng(0)
    host_batches = [{
        "hdr": rng.uniform(0, 2, size=shape).astype(np.float32),
        "elevation": (np.linspace(4, 28, b) + i).astype(np.float32),
    } for i in range(N)]
    keys = jax.random.split(jax.random.PRNGKey(7), N)
    keys_np = np.asarray(keys)

    # --- A: per-step dispatch, per-batch host upload (production today) ---
    state = create_gan_state(cfg, jax.random.PRNGKey(0))
    state, m = jstep(state, host_batches[0], keys[0])  # compile
    _host_sync(m["gen_total"])
    for rep in range(3):
        t0 = time.perf_counter()
        for bt, k in zip(host_batches, keys):
            state, m = jstep(state, bt, k)
        _host_sync(m["gen_total"])
        dt = (time.perf_counter() - t0) / N
        print(f"A per-step host-fed      rep{rep}: {dt * 1e3:8.2f} ms/step",
              flush=True)

    # --- C: host-stacked chunks, one upload + one dispatch per chunk ---
    for C in (8, 16):
        def run_chunk(st, bs, ks):
            def body(s, bk):
                return step(s, *bk)
            return jax.lax.scan(body, st, (bs, ks))

        jchunk = jax.jit(run_chunk, donate_argnums=(0,))
        state = create_gan_state(cfg, jax.random.PRNGKey(0))
        stacked0 = {k: np.stack([hb[k] for hb in host_batches[:C]])
                    for k in host_batches[0]}
        state, m = jchunk(state, stacked0, keys_np[:C])  # compile
        _host_sync(m["gen_total"])
        for rep in range(3):
            t0 = time.perf_counter()
            for i in range(0, N, C):
                stacked = {k: np.stack([hb[k] for hb in host_batches[i:i + C]])
                           for k in host_batches[0]}
                state, m = jchunk(state, stacked, keys_np[i:i + C])
            _host_sync(m["gen_total"])
            dt = (time.perf_counter() - t0) / N
            print(f"C host-stacked chunk={C:2d} rep{rep}: {dt * 1e3:8.2f} "
                  f"ms/step", flush=True)


if __name__ == "__main__":
    main()
