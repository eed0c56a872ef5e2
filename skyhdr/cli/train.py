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

    state = create_gan_state(cfg, jax.random.PRNGKey(args.seed))

    # Restore a pretrained SUN checkpoint into the GAN state (the
    # cross-stage weight handoff, reference train.py:223-230).
    sun_dir = args.sun or os.path.join(args.workdir,
                                       cfg.train.checkpoint_dir, "SUN")
    if os.path.isdir(sun_dir):
        from skyhdr.train.checkpoints import CheckpointManager
        from skyhdr.train.engine import create_sun_state

        sun_template = create_sun_state(cfg, jax.random.PRNGKey(args.seed))
        mgr = CheckpointManager(sun_dir, cfg.train.ckpt_max_to_keep)
        restored = mgr.restore_latest(sun_template)
        if restored is not None:
            state = state.replace(sun_vars=restored.sun_vars)
            print("Pretrained SUN checkpoint restored for fine-tuning")

    train_step = make_gan_train_step(cfg, banks_train, vgg)
    eval_step = make_gan_eval_step(cfg, load_banks(cfg, args.dorf, train=False),
                                   vgg)

    loop = TrainLoop(cfg, "SKY", state, train_step, eval_step,
                     train_ds, test_ds, workdir=args.workdir)
    loop.run(epochs=cfg.train.epochs, rng_seed=args.seed)


if __name__ == "__main__":
    main()
