"""Main GAN training entry point (reference train.py).

Example:
  python -m skyhdr.cli.train --dir dataset_128_32/tfrecord --epochs 1000
"""

from __future__ import annotations

import argparse
import os

import jax

from skyhdr.cli.common import (add_common_flags, config_from_args, load_banks,
                               load_vgg, make_dataset)
from skyhdr.train.engine import (create_gan_state, make_gan_eval_step,
                                 make_gan_train_step)
from skyhdr.train.loop import TrainLoop


def main(argv=None):
    parser = argparse.ArgumentParser(description="train the SKY GAN model")
    add_common_flags(parser)
    parser.add_argument("--sky", type=str, default=None,
                        help="pretrained SKY checkpoint dir (default: "
                             "<workdir>/checkpoints/SKY)")
    parser.add_argument("--sun", type=str, default=None,
                        help="pretrained SUN checkpoint dir to restore the "
                             "sun net from before fine-tuning")
    args = parser.parse_args(argv)

    cfg = config_from_args(args)
    banks_train = load_banks(cfg, args.dorf, train=True)
    vgg = load_vgg(args.vgg)

    train_ds = make_dataset(args, cfg,
                            os.path.join(cfg.data.dataset_dir, "train"),
                            shuffle=True, seed=args.seed)
    test_ds = make_dataset(args, cfg,
                           os.path.join(cfg.data.dataset_dir, "test"),
                           shuffle=False)

    train_step = make_gan_train_step(cfg, banks_train, vgg)
    eval_step = make_gan_eval_step(cfg, load_banks(cfg, args.dorf, train=False),
                                   vgg)

    loop = TrainLoop(cfg, "SKY",
                     lambda: create_gan_state(cfg, jax.random.PRNGKey(args.seed)),
                     train_step, eval_step,
                     train_ds, test_ds, workdir=args.workdir)

    # Cross-stage SUN weight handoff (reference train.py:223-230) — only on
    # a FRESH start (a SKY resume already carries fine-tuned sun_vars). The
    # SUN checkpoint is restored to HOST memory through an abstract template
    # and only sun_vars are device_put: the old concrete-template path held
    # GanState (6.5 GB) + SunState (9.7 GB at 64x256) on a 16 GB chip and
    # died with an async RESOURCE_EXHAUSTED.
    sun_dir = args.sun or os.path.join(args.workdir,
                                       cfg.train.checkpoint_dir, "SUN")
    if not loop.resumed and os.path.isdir(sun_dir):
        import jax.numpy as jnp

        from skyhdr.train.checkpoints import CheckpointManager
        from skyhdr.train.engine import create_sun_state

        # The SUN ckpt's param_dtype may differ from this stage's (e.g. f32
        # pretrain -> bf16-param GAN). param_dtype changes the SunState opt
        # TREE STRUCTURE (MasterParamsState wraps the Adam state), so try a
        # template per candidate dtype; the handoff helper then casts the
        # stored copy and refreshes the f32 master regardless.
        import dataclasses

        mgr = CheckpointManager(sun_dir, cfg.train.ckpt_max_to_keep)
        host = err = None
        for pd in dict.fromkeys([cfg.train.param_dtype, "float32",
                                 "bfloat16"]):
            sun_cfg = cfg.replace(train=dataclasses.replace(
                cfg.train, param_dtype=pd))
            abstract = jax.eval_shape(lambda k: create_sun_state(sun_cfg, k),
                                      jax.random.PRNGKey(args.seed))
            try:
                host = mgr.restore_latest_host(abstract)
                err = None
                break
            except Exception as e:  # structural mismatch: try next dtype
                err = e
        if err is not None:
            raise err
        if host is not None:
            from skyhdr.train.engine import replace_sun_params

            loop.state = replace_sun_params(
                cfg, loop.state,
                jax.tree_util.tree_map(jnp.asarray,
                                       host.sun_vars["params"]))
            print("Pretrained SUN checkpoint restored for fine-tuning")
    loop.run(epochs=cfg.train.epochs, rng_seed=args.seed)


if __name__ == "__main__":
    main()
