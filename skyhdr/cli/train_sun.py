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
        # Factory, not a concrete state: TrainLoop owns creation so resume
        # never holds two 9.7 GB SunStates (64x256) in HBM (loop.py).
        make_state = lambda: create_sun_state(cfg, jax.random.PRNGKey(args.seed))
        train_step = make_sun_train_step(cfg, banks)
        eval_step = make_sun_eval_step(cfg, load_banks(cfg, args.dorf,
                                                       train=False))

        out_dir = os.path.join(args.workdir, "outputImg", "SUN")
        epoch_hook = None
        if args.outputimg_every:
            from skyhdr.utils.io import write_hdr

            # Per-epoch dumps of the LAST eval batch, matching the
            # reference's set: sun_cam1/2/3 + pred + sungt grids
            # (train_sun.py:363-373) and a one-time groundTruth HDR dump on
            # the first completed epoch (train_sun.py:353-359 — visual
            # sanity for the targets the run is fitting).
            def epoch_hook(epoch, outputs, batch):
                if epoch % max(args.outputimg_every, 1) != 0:
                    return
                val = os.path.join(out_dir, "val")
                for name, imgs in [("pred", outputs["pred"]),
                                   ("sungt", outputs["gt"]),
                                   ("sun_cam1", outputs["cams"][0]),
                                   ("sun_cam2", outputs["cams"][1]),
                                   ("sun_cam3", outputs["cams"][2])]:
                    save_image_grid(np.asarray(imgs),
                                    os.path.join(val, name,
                                                 f"epoch{epoch}.png"))
                gt_dir = os.path.join(out_dir, "groundTruth")
                if not os.path.isdir(gt_dir) or not os.listdir(gt_dir):
                    os.makedirs(gt_dir, exist_ok=True)
                    hdrs = np.asarray(batch["hdr"])
                    for i in range(hdrs.shape[0]):
                        write_hdr(os.path.join(gt_dir, f"{i}_gt.hdr"),
                                  hdrs[i])

        loop = TrainLoop(cfg, "SUN", make_state, train_step, eval_step,
                         train_ds, test_ds, workdir=args.workdir,
                         epoch_hook=epoch_hook)
        loop.run(epochs=cfg.train.epochs, rng_seed=args.seed)
        return

    # ----- eval/visualization mode (reference train_sun.py:393-471) -----
    from skyhdr.data.degradation import degrade_batch
    from skyhdr.models.gradcam import sunpose_with_cams
    from skyhdr.models.sunpose import SunPoseNet
    from skyhdr.train.checkpoints import CheckpointManager
    from skyhdr.utils.io import read_hdr

    assert args.inference_img_dir, "--inference_img_dir required with --train false"
    # Serving path: host-restore through an abstract template and device_put
    # only sun_vars — the Adam moments (6.4 GB at 64x256) stay off-chip.
    key0 = jax.random.PRNGKey(args.seed)
    mgr = CheckpointManager(os.path.join(args.workdir,
                                         cfg.train.checkpoint_dir, "SUN"),
                            cfg.train.ckpt_max_to_keep)
    abstract = jax.eval_shape(lambda k: create_sun_state(cfg, k), key0)
    host = mgr.restore_latest_host(abstract)
    if host is not None:
        sun_vars = jax.tree_util.tree_map(jnp.asarray, host.sun_vars)
        print("Latest SUN checkpoint restored")
    else:
        sun_vars = create_sun_state(cfg, key0).sun_vars

    sun = SunPoseNet(cfg.model)
    sun_apply = jax.jit(lambda v, x: sunpose_with_cams(
        lambda vv, xx, eps: sun.apply(vv, xx, eps), v, x, None))

    from skyhdr.ops.resize import resize_bilinear

    out_dir = os.path.join(args.workdir, "outputImg", "SUN", "eval")
    h, w = cfg.model.im_height, cfg.model.im_width
    key = jax.random.PRNGKey(args.seed)
    for path in sorted(glob.glob(os.path.join(args.inference_img_dir, "*.hdr"))):
        hdr = read_hdr(path)
        hdr = 0.5 * hdr / (hdr.mean() + 1e-6)
        key, sub = jax.random.split(key)
        _, ldr = degrade_batch(sub, jnp.asarray(hdr)[None], banks)
        sm, cams = sun_apply(sun_vars, ldr)
        pred = np.asarray(sm).reshape(h, w)
        # CAM-gated prediction (reference train_sun.py:445-447):
        # sum_pred = cam1 * resize(cam2) * pred, max-normalized.
        cam2_up = np.asarray(resize_bilinear(cams[1], (h, w)))[0, ..., 0]
        sum_pred = np.asarray(cams[0])[0, ..., 0] * cam2_up * pred
        sum_pred = sum_pred / (sum_pred.max() + 1e-5)
        name = os.path.splitext(os.path.basename(path))[0]
        # The reference's 6-panel figure (train_sun.py:449-471): CAM1-3,
        # prediction, CAM-gated prediction, source HDR.
        save_eval_panel(
            [np.asarray(cams[0])[0], np.asarray(cams[1])[0],
             np.asarray(cams[2])[0], pred / (pred.max() + 1e-12),
             sum_pred, np.clip(hdr, 0, 1)],
            ["Grad-CAM 1", "Grad-CAM 2", "Grad-CAM 3",
             "sun-pose prediction", "CAM-gated prediction (sum_pred)",
             f"source HDR (clipped): {name}"],
            os.path.join(out_dir, f"{name}.png"),
        )
        print("wrote", os.path.join(out_dir, f"{name}.png"))


if __name__ == "__main__":
    main()
