"""Shared CLI plumbing: flags -> Config, bank loading, str2bool."""

from __future__ import annotations

import argparse
import os

from skyhdr.config import Config, DataConfig, ModelConfig, TrainConfig
from skyhdr.data.degradation import DegradationBanks
from skyhdr.utils.io import get_exposure_lists, load_dorf_curves, make_synthetic_dorf


def str2bool(v) -> bool:
    """reference utils.py:134-142."""
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def add_common_flags(parser: argparse.ArgumentParser):
    """The overlapping flag set of reference train.py:531-543 /
    train_sun.py:478-488."""
    cwd = os.getcwd()
    parser.add_argument("--dir", type=str, default=None,
                        help="tfrecord dataset root (with train/ and test/)")
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--batchsize", type=int, default=32)
    parser.add_argument("--epochs", type=int, default=1000)
    parser.add_argument("--imheight", type=int, default=32)
    parser.add_argument("--imwidth", type=int, default=128)
    parser.add_argument("--dorf", type=str,
                        default=os.path.join(cwd, "dorfCurves.txt"))
    parser.add_argument("--vgg", type=str,
                        default=os.path.join(cwd, "vgg16.npy"))
    parser.add_argument("--da-conv", type=str2bool, default=False,
                        help="use the distortion-aware equirect conv")
    parser.add_argument("--compute-dtype", type=str, default="float32",
                        choices=("float32", "bfloat16"),
                        help="conv-stack compute dtype (radiance head, "
                             "softmax and norms stay f32; bfloat16 is ~2.5x "
                             "faster per train step on v5e)")
    parser.add_argument("--opt-state-dtype", type=str, default="float32",
                        choices=("float32", "bfloat16"),
                        help="optimizer-moment storage dtype: bfloat16 "
                             "halves the optimizer slice of HBM residency "
                             "and checkpoint bytes (update math stays f32; "
                             "measured quality-free in the one-knob DA "
                             "ablation — see BASELINE.md)")
    parser.add_argument("--grad-dtype", type=str, default="float32",
                        choices=("float32", "bfloat16"),
                        help="gradient staging dtype: bfloat16 stages the "
                             "param-sized dW buffers at half width (update "
                             "math stays f32; perf-neutral per step and "
                             "costs ~1-2 dB PSNR in the one-knob DA "
                             "ablation — prefer --opt-state-dtype for HBM "
                             "relief; see BASELINE.md)")
    parser.add_argument("--param-dtype", type=str, default="float32",
                        choices=("float32", "bfloat16"),
                        help="stored model-parameter dtype for training: "
                             "bfloat16 streams half-width params through the "
                             "forward/backward while the optimizer keeps an "
                             "f32 master copy in its state (update math and "
                             "accumulation stay f32; see "
                             "TrainConfig.param_dtype)")
    parser.add_argument("--streaming", type=str2bool, default=None,
                        help="stream TFRecords with a windowed shuffle "
                             "buffer instead of caching the split in RAM "
                             "(default: auto — stream when the decoded "
                             "split would exceed ~2 GB)")
    parser.add_argument("--shuffle-buffer", type=int, default=10000,
                        help="streaming shuffle window (reference "
                             "train.py:129)")
    parser.add_argument("--workdir", type=str, default=cwd)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--ckpt-every", type=int, default=10,
                        help="checkpoint save cadence in epochs "
                             "(reference train.py:516)")
    parser.add_argument("--steps-per-dispatch", type=int, default=1,
                        help="train steps scanned per device dispatch "
                             "(TrainLoop chunking; identical update "
                             "sequence — see TrainConfig.steps_per_dispatch "
                             "for when >1 helps)")
    parser.add_argument("--compilation-cache", type=str, default=None,
                        metavar="DIR",
                        help="persistent XLA compilation cache directory "
                             "(jax_compilation_cache_dir): re-invocations "
                             "of any CLI skip recompiling graphs already "
                             "compiled by a previous process — first jit "
                             "of each unique graph costs 10-60 s on this "
                             "runtime. Equivalent to setting "
                             "JAX_COMPILATION_CACHE_DIR")
    return parser


def apply_runtime_flags(args, log=print):
    """Apply flags that configure the JAX runtime rather than the Config
    tree. Must run before first device use."""
    cache = getattr(args, "compilation_cache", None)
    if cache:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache)
        # Cache every graph: the default 1s/minimum-size thresholds skip
        # exactly the many small jits (resize matmuls, metric reduces) whose
        # compiles still pay the remote round-trip on this runtime.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        log(f"[skyhdr] persistent compilation cache at {cache}")


def config_from_args(args) -> Config:
    # Runtime (non-Config) flags first: every CLI calls config_from_args
    # immediately after parsing and before touching devices.
    apply_runtime_flags(args)
    return Config(
        model=ModelConfig(im_height=args.imheight, im_width=args.imwidth,
                          use_da_conv=getattr(args, "da_conv", False),
                          compute_dtype=getattr(args, "compute_dtype",
                                                "float32")),
        data=DataConfig(batch_size=args.batchsize,
                        dataset_dir=args.dir or os.path.join(
                            args.workdir,
                            f"dataset_{args.imwidth}_{args.imheight}/tfrecord")),
        train=TrainConfig(learning_rate=args.lr, epochs=args.epochs,
                          vgg_path=getattr(args, "vgg", None),
                          opt_state_dtype=getattr(args, "opt_state_dtype",
                                                  "float32"),
                          grad_dtype=getattr(args, "grad_dtype", "float32"),
                          param_dtype=getattr(args, "param_dtype", "float32"),
                          ckpt_every_epochs=getattr(args, "ckpt_every", 10),
                          steps_per_dispatch=getattr(
                              args, "steps_per_dispatch", 1),
                          seed=args.seed),
    )


_STREAM_THRESHOLD_BYTES = 2 << 30  # cache below ~2 GB decoded, stream above


def make_dataset(args, cfg: Config, split_dir: str, *, shuffle: bool,
                 seed: int = 0, log=print):
    """Build the input dataset for one split: the in-RAM cached
    PanoramaDataset for small splits, the constant-memory
    StreamingPanoramaDataset (windowed shuffle buffer, per-process file
    sharding) when the decoded split would not fit comfortably or when
    --streaming true is passed."""
    import glob as _glob

    from skyhdr.data.pipeline import PanoramaDataset, StreamingPanoramaDataset

    streaming = getattr(args, "streaming", None)
    if streaming is None:
        h, w, c = cfg.model.imshape
        # Compressed tfrecords decode to h*w*c f32; estimate from file count
        # is unreliable (one record per file in the reference layout), so
        # size the raw bytes on disk ~= decoded bytes / (gzip ratio ~2).
        disk = sum(os.path.getsize(p) for p in
                   _glob.glob(os.path.join(split_dir, "*.tfrecord")))
        streaming = disk * 2 > _STREAM_THRESHOLD_BYTES
    if streaming:
        log(f"[skyhdr] streaming {split_dir} "
            f"(shuffle buffer {getattr(args, 'shuffle_buffer', 10000)})")
        return StreamingPanoramaDataset(
            split_dir, imshape=cfg.model.imshape,
            batch_size=cfg.data.batch_size, shuffle=shuffle,
            shuffle_buffer=getattr(args, "shuffle_buffer", 10000), seed=seed)
    return PanoramaDataset(split_dir, imshape=cfg.model.imshape,
                           batch_size=cfg.data.batch_size, shuffle=shuffle,
                           seed=seed)


def load_banks(cfg: Config, dorf_path: str, train: bool = True,
               log=print) -> DegradationBanks:
    """DoRF curves + exposure sweep; falls back to the synthetic CRF family
    when dorfCurves.txt is absent (it is gitignored in the reference too)."""
    train_t, test_t = get_exposure_lists(cfg.data.n_train_exposures,
                                         cfg.data.n_test_exposures)
    if dorf_path and os.path.exists(dorf_path):
        train_crf, test_crf = load_dorf_curves(dorf_path)
    else:
        log(f"[skyhdr] {dorf_path!r} not found; using the synthetic CRF "
            f"family (see skyhdr.utils.io.make_synthetic_dorf)")
        crf = make_synthetic_dorf(201, 1024)
        train_crf, test_crf = crf[:175], crf[175:]
    from skyhdr.data.degradation import make_banks

    return make_banks(train_crf if train else test_crf,
                      train_t if train else test_t)


def restore_model_vars(cfg: Config, workdir: str, *, sky: str = None,
                       sun: str = None, seed: int = 0, log=print):
    """(gen_vars, sun_vars) for SERVING with minimal HBM residency.

    Checkpoints are restored to HOST memory through abstract templates
    (CheckpointManager.restore_latest_host) and only the model variables
    are device_put — the optimizer moments (2x the 3.2 GB sunpose FCs at
    64x256) never touch the 16 GB chip. A real on-device init runs only
    when no SKY checkpoint exists (the untrained-floor case), and its
    optimizer slots are dropped immediately.

    The reference rebuilds + restores both FULL models per image
    (inference.py:50-79); this is the memory-safe once-only equivalent.
    """
    import jax
    import jax.numpy as jnp

    from skyhdr.train.checkpoints import CheckpointManager
    from skyhdr.train.engine import create_gan_state, create_sun_state

    key = jax.random.PRNGKey(seed)
    put = lambda tree: jax.tree_util.tree_map(jnp.asarray, tree)

    def restore_host(ckpt_dir, factory):
        """Host restore that tolerates checkpoints trained with either
        TrainConfig.param_dtype: the knob wraps the opt state in
        MasterParamsState, so the abstract template's TREE STRUCTURE must
        match the save — try the configured dtype first, then the other."""
        import dataclasses

        err = None
        for pd in dict.fromkeys([cfg.train.param_dtype, "float32",
                                 "bfloat16"]):
            c = cfg.replace(train=dataclasses.replace(cfg.train,
                                                      param_dtype=pd))
            abstract = jax.eval_shape(lambda k: factory(c, k), key)
            try:
                return CheckpointManager(ckpt_dir).restore_latest_host(
                    abstract)
            except Exception as e:  # structural mismatch: try next dtype
                err = e
        raise err  # every template failed: a real (corrupt-ckpt) error

    gen_vars = sun_vars = None
    sky_dir = sky or os.path.join(workdir, cfg.train.checkpoint_dir, "SKY")
    if os.path.isdir(sky_dir):
        host = restore_host(sky_dir, create_gan_state)
        if host is not None:
            gen_vars, sun_vars = put(host.gen_vars), put(host.sun_vars)
            log("Latest SKY checkpoint restored")
    if gen_vars is None:
        state = create_gan_state(cfg, key)
        gen_vars, sun_vars = state.gen_vars, state.sun_vars
        del state  # frees opt slots (3.2 GB at 64x256)
    sun_dir = sun or os.path.join(workdir, cfg.train.checkpoint_dir, "SUN")
    if os.path.isdir(sun_dir):
        host = restore_host(sun_dir, create_sun_state)
        if host is not None:
            sun_vars = put(host.sun_vars)
            log("Latest SUN checkpoint restored")
    return gen_vars, sun_vars


def load_vgg(path: str, log=print):
    from skyhdr.models.vgg16 import load_vgg16_npy, random_vgg16_weights

    if path and os.path.exists(path):
        return load_vgg16_npy(path)
    log(f"[skyhdr] {path!r} not found; using deterministic random frozen "
        f"VGG features (perceptual loss still well-defined)")
    return random_vgg16_weights()
