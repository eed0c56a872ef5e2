"""Sun-pose pretraining entry point (reference train_sun.py).

--train true  : pretrain SunPoseNet with the KL + DoG loss, per-epoch CAM
                PNG dumps (reference train_sun.py:329-373).
--train false : eval/visualization mode on .hdr files — degrade inline, run
                inference, save multi-panel figures (train_sun.py:393-471).
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np
import jax
import jax.numpy as jnp

from skyhdr.cli.common import (add_common_flags, config_from_args, load_banks,
                               make_dataset, str2bool)
from skyhdr.train.engine import (create_sun_state, make_sun_eval_step,
                                 make_sun_train_step)
from skyhdr.train.loop import TrainLoop
from skyhdr.utils.vis import save_eval_panel, save_image_grid


def main(argv=None):
    parser = argparse.ArgumentParser(description="pretrain the sun-pose net")
    add_common_flags(parser)
    parser.add_argument("--train", type=str2bool, default=True)
    parser.add_argument("--inference_img_dir", type=str, default=None,
                        help=".hdr directory for --train false eval mode")
    parser.add_argument("--outputimg-every", type=int, default=1,
                        help="dump CAM grids every N epochs (0 disables)")
    args = parser.parse_args(argv)

    cfg = config_from_args(args)
    banks = load_banks(cfg, args.dorf, train=True)

    if args.train:
        train_ds = make_dataset(args, cfg,
                                os.path.join(cfg.data.dataset_dir, "train"),
                                shuffle=True, seed=args.seed)
        test_ds = make_dataset(args, cfg,
                               os.path.join(cfg.data.dataset_dir, "test"),
                               shuffle=False)
        state = create_sun_state(cfg, jax.random.PRNGKey(args.seed))
        train_step = make_sun_train_step(cfg, banks)
        eval_step = make_sun_eval_step(cfg, load_banks(cfg, args.dorf,
                                                       train=False))
        loop = TrainLoop(cfg, "SUN", state, train_step, eval_step,
                         train_ds, test_ds, workdir=args.workdir)

        out_dir = os.path.join(args.workdir, "outputImg", "SUN")
        if args.outputimg_every:
            # Wrap eval_step to dump CAM/pred grids once per eval pass (the
            # reference dumps per epoch, train_sun.py:329-337,363-373).
            base_eval = eval_step
            batches_per_epoch = max(len(test_ds), 1)
            box = {"batch": 0}

            def eval_with_dumps(state, batch, key):
                metrics, outputs = base_eval(state, batch, key)
                box["batch"] += 1
                epoch, pos = divmod(box["batch"], batches_per_epoch)
                if pos == 0 and epoch % max(args.outputimg_every, 1) == 0:
                    save_image_grid(np.asarray(outputs["pred"]),
                                    os.path.join(out_dir, "val",
                                                 f"pred_epoch{epoch}.png"))
                    save_image_grid(np.asarray(outputs["cams"][0]),
                                    os.path.join(out_dir, "val",
                                                 f"cam1_epoch{epoch}.png"))
                return metrics, outputs

            loop.eval_step = eval_with_dumps
        loop.run(epochs=cfg.train.epochs, rng_seed=args.seed)
        return

    # ----- eval/visualization mode (reference train_sun.py:393-471) -----
    from skyhdr.data.degradation import degrade_batch
    from skyhdr.models.gradcam import sunpose_with_cams
    from skyhdr.models.sunpose import SunPoseNet
    from skyhdr.train.checkpoints import CheckpointManager
    from skyhdr.utils.io import read_hdr

    assert args.inference_img_dir, "--inference_img_dir required with --train false"
    state = create_sun_state(cfg, jax.random.PRNGKey(args.seed))
    mgr = CheckpointManager(os.path.join(args.workdir,
                                         cfg.train.checkpoint_dir, "SUN"),
                            cfg.train.ckpt_max_to_keep)
    restored = mgr.restore_latest(state)
    if restored is not None:
        state = restored
        print("Latest SUN checkpoint restored")

    sun = SunPoseNet(cfg.model)
    sun_apply = jax.jit(lambda v, x: sunpose_with_cams(
        lambda vv, xx, eps: sun.apply(vv, xx, eps), v, x, None))

    out_dir = os.path.join(args.workdir, "outputImg", "SUN", "eval")
    key = jax.random.PRNGKey(args.seed)
    for path in sorted(glob.glob(os.path.join(args.inference_img_dir, "*.hdr"))):
        hdr = read_hdr(path)
        hdr = 0.5 * hdr / (hdr.mean() + 1e-6)
        key, sub = jax.random.split(key)
        _, ldr = degrade_batch(sub, jnp.asarray(hdr)[None], banks)
        sm, cams = sun_apply(state.sun_vars, ldr)
        pred = np.asarray(sm).reshape(cfg.model.im_height, cfg.model.im_width)
        name = os.path.splitext(os.path.basename(path))[0]
        save_eval_panel(
            [np.asarray(ldr)[0], pred / pred.max(),
             np.asarray(cams[0])[0], np.clip(hdr, 0, 1)],
            ["degraded LDR input", "sun-pose prediction", "Grad-CAM 1",
             "ground-truth HDR (clipped)"],
            os.path.join(out_dir, f"{name}.png"),
        )
        print("wrote", os.path.join(out_dir, f"{name}.png"))


if __name__ == "__main__":
    main()
