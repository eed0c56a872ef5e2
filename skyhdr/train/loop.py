"""Epoch driver: the reference's run() orchestration (train.py:444-525,
train_sun.py:304-380) — per-epoch metric resets, train + test passes,
TensorBoard scalars, checkpoint save every N epochs, restore-latest resume.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional

import jax

from skyhdr.config import Config
from skyhdr.train.checkpoints import CheckpointManager
from skyhdr.train.metrics import EventWriter, MeanMetrics
from skyhdr.utils.dirs import create_new_dir, timestamp


class TrainLoop:
    """Drives (train_step, eval_step) over (train_ds, test_ds) for epochs.

    The epoch counter lives in the checkpointed state (state.epoch), which —
    unlike the reference's restarting Python loop counter (train.py:444 vs
    ckpt.epoch, SURVEY.md §5) — makes resume exact.
    """

    def __init__(self, cfg: Config, name: str, state, train_step, eval_step,
                 train_ds, test_ds, *, workdir: str = ".",
                 log: Callable = print, prefetch: int = 2,
                 epoch_hook: Optional[Callable] = None):
        self.cfg = cfg
        self.name = name
        self.train_step = train_step
        self.eval_step = eval_step
        self.train_ds = train_ds
        self.test_ds = test_ds
        self.log = log
        self.prefetch = prefetch
        # Called as epoch_hook(epoch, eval_outputs, eval_batch) after each
        # epoch with the LAST eval batch — the reference's per-epoch
        # CAM/pred/GT dump point (train_sun.py:363-373). The epoch number is
        # the loop's own (authoritative, checkpoint-resumable) counter, not
        # inferred from batch counts (a non-constant test set size must not
        # shift dump labels).
        self.epoch_hook = epoch_hook

        ckpt_dir = os.path.join(workdir, cfg.train.checkpoint_dir, name)
        self.ckpt = CheckpointManager(ckpt_dir, cfg.train.ckpt_max_to_keep)
        self.resumed = False
        if callable(state):
            # state is a zero-arg FACTORY: the loop owns state creation, so
            # HBM never holds two copies. Resume path: abstract template
            # (jax.eval_shape — zero device bytes) -> host restore ->
            # device_put once. Fresh path: call the factory. At 64x256 the
            # SunState is 9.7 GB; the concrete-template restore held 2x
            # that transiently (checkpoints.restore_latest_host docstring).
            # NOTE: eval_shape EXECUTES the factory (abstractly) — keep
            # factories side-effect free; post-init handoffs (cli/train.py's
            # SUN restore) belong behind `loop.resumed`.
            import jax.numpy as jnp

            abstract = jax.eval_shape(state)
            host = self.ckpt.restore_latest_host(abstract)
            if host is not None:
                self.state = jax.tree_util.tree_map(jnp.asarray, host)
                self.resumed = True
                self.log(f"Latest {name} checkpoint restored "
                         f"(epoch {int(self.state.epoch)})")
            else:
                self.state = state()
        else:
            self.state = state
            restored = self.ckpt.restore_latest(self.state)
            if restored is not None:
                self.state = restored
                self.resumed = True
                self.log(f"Latest {name} checkpoint restored "
                         f"(epoch {int(self.state.epoch)})")

        tb_root = create_new_dir(
            os.path.join(workdir, cfg.train.tensorboard_dir, name), timestamp()
        )
        self.tb_train = EventWriter(os.path.join(tb_root, "train"))
        self.tb_test = EventWriter(os.path.join(tb_root, "val"))
        self.log(f"tensorboard --logdir={tb_root}")
        self._chunk_step = None  # built on first use (jit of scanned steps)

    def _chunked(self, chunk: int):
        """One jitted dispatch running `chunk` train steps via lax.scan.

        The scan threads the SAME per-batch keys in the same order as the
        per-step path, so training is functionally identical — only the
        dispatch count changes. Off by default: on the tunneled v5e the
        per-step path already pipelines dispatches and chunking measured
        neutral-to-worse (tools/exp_chunk.py; TrainConfig.steps_per_dispatch
        docstring has the numbers)."""
        if self._chunk_step is None:
            import jax.numpy as jnp

            train_step = self.train_step

            def run_chunk(state, batches, keys):
                def body(s, bk):
                    b, k = bk
                    return train_step(s, b, k)
                return jax.lax.scan(body, state, (batches, keys))

            self._chunk_step = jax.jit(run_chunk, donate_argnums=(0,))
        return self._chunk_step

    def _flush_chunk(self, pending, metrics_bank):
        import jax.numpy as jnp

        batches, keys = zip(*pending)
        if len(pending) == 1:
            state, metrics = self.train_step(self.state, batches[0], keys[0])
        elif len(pending) < int(self.cfg.train.steps_per_dispatch):
            # Epoch-tail remainder: reuse the per-step compile instead of
            # compiling a second scan length.
            state = self.state
            for b, k in pending:
                state, metrics = self.train_step(state, b, k)
                metrics_bank.update(metrics)
            self.state = state
            return
        else:
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *batches)
            state, metrics = self._chunked(len(pending))(
                self.state, stacked, jnp.stack(keys))
        self.state = state
        metrics_bank.update(metrics)

    def _feed(self, ds):
        """Overlap host decode/stack with device compute (the reference's
        prefetch(AUTOTUNE) analog, train.py:129)."""
        if self.prefetch:
            from skyhdr.data.pipeline import prefetch_to_device

            return prefetch_to_device(iter(ds), size=self.prefetch)
        return iter(ds)

    def run(self, epochs: Optional[int] = None, rng_seed: int = 0):
        epochs = epochs or self.cfg.train.epochs
        key = jax.random.PRNGKey(rng_seed)
        train_metrics = MeanMetrics()
        test_metrics = MeanMetrics()

        start_epoch = int(self.state.epoch)
        for epoch in range(start_epoch + 1, epochs + 1):
            t0 = time.perf_counter()
            train_metrics.reset()
            test_metrics.reset()

            chunk = max(1, int(self.cfg.train.steps_per_dispatch))
            pending = []
            for batch in self._feed(self.train_ds):
                key, sub = jax.random.split(key)
                pending.append((batch, sub))
                if len(pending) == chunk:
                    self._flush_chunk(pending, train_metrics)
                    pending = []
            if pending:
                self._flush_chunk(pending, train_metrics)

            last_eval = None
            for batch in self._feed(self.test_ds):
                key, sub = jax.random.split(key)
                metrics, outputs = self.eval_step(self.state, batch, sub)
                test_metrics.update(metrics)
                last_eval = (outputs, batch)

            self.state = self.state.replace(
                epoch=self.state.epoch * 0 + epoch
            )
            if self.epoch_hook is not None and last_eval is not None:
                self.epoch_hook(epoch, *last_eval)
            self.tb_train.scalars(train_metrics.result(), epoch)
            self.tb_test.scalars(test_metrics.result(), epoch)

            if epoch % self.cfg.train.ckpt_every_epochs == 0:
                self.ckpt.save(epoch, self.state)
                self.log(f"Saved {self.name} checkpoint for epoch {epoch}")

            tr = train_metrics.result()
            te = test_metrics.result()
            self.log(f"Epoch {epoch}: train={_fmt(tr)} test={_fmt(te)} "
                     f"elapsed={time.perf_counter() - t0:.1f}s")
        return self.state


def _fmt(metrics):
    return "{" + ", ".join(f"{k}={v:.4g}" for k, v in sorted(metrics.items())
                           if not k.startswith("_")) + "}"
