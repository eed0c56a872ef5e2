"""End-to-end integration: TFRecord dataset -> TrainLoop (train+eval+ckpt+TB)
-> resume; TB events readable by stock TensorBoard; CLI smoke tests."""

import glob
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skyhdr.config import Config, DataConfig, ModelConfig, TrainConfig
from skyhdr.data.pipeline import PanoramaDataset
from skyhdr.data.records import write_tfrecord
from skyhdr.train.checkpoints import CheckpointManager
from skyhdr.train.engine import (create_sun_state, make_sun_eval_step,
                                 make_sun_train_step)
from skyhdr.train.loop import TrainLoop
from skyhdr.train.metrics import EventWriter, MeanMetrics
from skyhdr.cli.common import load_banks

H, W = 16, 64


def _write_dataset(root, n=4, seed=0):
    rng = np.random.default_rng(seed)
    for split in ("train", "test"):
        d = os.path.join(root, split)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            img = (rng.uniform(0, 1, size=(H, W, 3)) ** 2 * 3).astype(np.float32)
            write_tfrecord(os.path.join(d, f"{split}{i}.tfrecord"),
                           [{"image": img.tobytes(), "azimuth": 31.0,
                             "elevation": float(4 + i)}])
    return root


@pytest.fixture(scope="module")
def cfg():
    return Config(model=ModelConfig(im_height=H, im_width=W),
                  data=DataConfig(batch_size=2),
                  train=TrainConfig(epochs=2, ckpt_every_epochs=1,
                                    ckpt_max_to_keep=2))


def test_mean_metrics():
    m = MeanMetrics()
    m.update({"a": 1.0})
    m.update({"a": 3.0, "b": 2.0})
    assert m.result() == {"a": 2.0, "b": 2.0}
    m.reset()
    assert m.result() == {}


def test_event_writer_tensorboard_compat(tmp_path):
    w = EventWriter(str(tmp_path))
    w.scalar("loss", 1.5, 1)
    w.scalar("loss", 0.5, 2)
    w.flush()
    w.close()
    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1

    tf = pytest.importorskip("tensorflow")
    events = []
    for raw in tf.data.TFRecordDataset(files[0]):
        ev = tf.compat.v1.Event()
        ev.ParseFromString(raw.numpy())
        events.append(ev)
    assert events[0].file_version == "brain.Event:2"
    scalars = [(e.step, e.summary.value[0].tag, e.summary.value[0].simple_value)
               for e in events[1:]]
    assert scalars == [(1, "loss", 1.5), (2, "loss", 0.5)]


def test_event_reader_roundtrip(tmp_path):
    """tools/quality_report.py's TF-free reader decodes EventWriter output."""
    import sys

    sys.path.insert(0, "tools")
    try:
        from quality_report import read_events
    finally:
        sys.path.pop(0)

    w = EventWriter(str(tmp_path))
    w.scalars({"kl": 1.25, "dog": 3.5}, 7)
    w.scalars({"kl": 0.75}, 8)
    w.close()
    (path,) = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert sorted(read_events(path)) == [
        (7, "dog", 3.5), (7, "kl", 1.25), (8, "kl", 0.75)]


def test_checkpoint_roundtrip(tmp_path, cfg):
    state = create_sun_state(cfg, jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    assert mgr.restore_latest(state) is None
    mgr.save(1, state)
    state2 = create_sun_state(cfg, jax.random.PRNGKey(9))  # different init
    restored = mgr.restore_latest(state2)
    assert restored is not None
    a = jax.tree_util.tree_leaves(state.sun_vars["params"])
    b = jax.tree_util.tree_leaves(restored.sun_vars["params"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    mgr.close()


def test_train_loop_runs_and_resumes(tmp_path, cfg):
    root = _write_dataset(str(tmp_path / "data"))
    train_ds = PanoramaDataset(os.path.join(root, "train"), imshape=(H, W, 3),
                               batch_size=2, shuffle=True)
    test_ds = PanoramaDataset(os.path.join(root, "test"), imshape=(H, W, 3),
                              batch_size=2, shuffle=False)
    banks = load_banks(cfg, dorf_path=None, log=lambda *a: None)

    state = create_sun_state(cfg, jax.random.PRNGKey(0))
    loop = TrainLoop(cfg, "SUN", state,
                     make_sun_train_step(cfg, banks),
                     make_sun_eval_step(cfg, banks),
                     train_ds, test_ds, workdir=str(tmp_path),
                     log=lambda *a: None)
    final = loop.run(epochs=2)
    assert int(final.epoch) == 2
    assert int(final.step) == 2 * len(train_ds)
    ckpts = os.listdir(os.path.join(str(tmp_path), "checkpoints", "SUN"))
    assert len(ckpts) >= 2

    # Resume: a fresh loop restores epoch 2 and does nothing more for
    # epochs=2.
    state_fresh = create_sun_state(cfg, jax.random.PRNGKey(5))
    loop2 = TrainLoop(cfg, "SUN", state_fresh,
                      make_sun_train_step(cfg, banks),
                      make_sun_eval_step(cfg, banks),
                      train_ds, test_ds, workdir=str(tmp_path),
                      log=lambda *a: None)
    assert int(loop2.state.epoch) == 2
    resumed = loop2.run(epochs=2)
    assert int(resumed.step) == int(final.step)


def test_train_loop_factory_resume_host_restore(tmp_path, cfg):
    """TrainLoop with a state FACTORY (the memory-lean CLI path: at 64x256
    the concrete-template resume held 2x a 9.7 GB SunState in HBM): fresh
    start calls the factory; resume host-restores WITHOUT calling it and
    yields the exact saved state."""
    root = _write_dataset(str(tmp_path / "data"))
    train_ds = PanoramaDataset(os.path.join(root, "train"), imshape=(H, W, 3),
                               batch_size=2, shuffle=True)
    test_ds = PanoramaDataset(os.path.join(root, "test"), imshape=(H, W, 3),
                              batch_size=2, shuffle=False)
    banks = load_banks(cfg, dorf_path=None, log=lambda *a: None)

    loop = TrainLoop(cfg, "SUN",
                     lambda: create_sun_state(cfg, jax.random.PRNGKey(0)),
                     make_sun_train_step(cfg, banks),
                     make_sun_eval_step(cfg, banks),
                     train_ds, test_ds, workdir=str(tmp_path),
                     log=lambda *a: None)
    final = loop.run(epochs=1)

    # A factory with a DIFFERENT seed: if resume used it concretely instead
    # of restoring, the params below could not match the saved state. (The
    # factory is still traced abstractly via jax.eval_shape — that allocates
    # nothing on device.)
    loop2 = TrainLoop(cfg, "SUN",
                      lambda: create_sun_state(cfg, jax.random.PRNGKey(3)),
                      make_sun_train_step(cfg, banks),
                      make_sun_eval_step(cfg, banks),
                      train_ds, test_ds, workdir=str(tmp_path),
                      log=lambda *a: None)
    assert int(loop2.state.epoch) == 1
    for x, y in zip(jax.tree_util.tree_leaves(final.sun_vars),
                    jax.tree_util.tree_leaves(loop2.state.sun_vars)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_restore_latest_host_matches_device_restore(tmp_path, cfg):
    """restore_latest_host returns numpy leaves bit-equal to the device
    restore (the serving CLIs device_put only the sub-trees they need)."""
    state = create_sun_state(cfg, jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    assert mgr.restore_latest_host(state) is None
    mgr.save(1, state)
    abstract = jax.eval_shape(lambda: create_sun_state(cfg,
                                                       jax.random.PRNGKey(7)))
    host = mgr.restore_latest_host(abstract)
    assert all(isinstance(x, np.ndarray)
               for x in jax.tree_util.tree_leaves(host))
    for x, y in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(host)):
        np.testing.assert_array_equal(np.asarray(x), y)
    mgr.close()


def test_cli_inference_smoke(tmp_path):
    PIL = pytest.importorskip("PIL.Image")
    indir = tmp_path / "in"
    indir.mkdir()
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 1, size=(H, W, 3)) * 255).astype(np.uint8)
    PIL.fromarray(img).save(str(indir / "x.jpg"))

    from skyhdr.cli.inference import main as infer_main

    outdir = tmp_path / "out"
    infer_main(["--indir", str(indir), "--outdir", str(outdir),
                "--imheight", str(H), "--imwidth", str(W),
                "--workdir", str(tmp_path)])
    outs = list(outdir.glob("*.hdr"))
    assert len(outs) == 1
    from skyhdr.utils.io import read_hdr

    hdr = read_hdr(str(outs[0]))
    assert hdr.shape == (H, W, 3)
    assert np.isfinite(hdr).all()


def test_cli_inference_request_batching(tmp_path):
    """--batch groups images per dispatch; the tail group is padded to the
    compiled batch shape and padded outputs dropped.

    All three inputs are the SAME image: the reference's sun_rad_estimation
    normalizes the sun-pose PDF by the batch-GLOBAL max (reference
    generator.py:160, tf.reduce_max with no axis), so different images in
    one batch legitimately perturb each other's outputs — with identical
    images the batched results must match the per-image run exactly (up to
    RGBE quantization), which isolates the grouping/padding mechanics."""
    PIL = pytest.importorskip("PIL.Image")
    indir = tmp_path / "in"
    indir.mkdir()
    rng = np.random.default_rng(3)
    img = (rng.uniform(0, 1, size=(H, W, 3)) * 255).astype(np.uint8)
    for i in range(3):  # 3 images, batch 2 -> one full + one padded group
        PIL.fromarray(img).save(str(indir / f"x{i}.jpg"))

    from skyhdr.cli.inference import main as infer_main
    from skyhdr.utils.io import read_hdr

    out1 = tmp_path / "out1"
    infer_main(["--indir", str(indir), "--outdir", str(out1),
                "--imheight", str(H), "--imwidth", str(W),
                "--workdir", str(tmp_path)])
    out2 = tmp_path / "out2"
    infer_main(["--indir", str(indir), "--outdir", str(out2),
                "--imheight", str(H), "--imwidth", str(W),
                "--workdir", str(tmp_path), "--batch", "2"])
    ref = read_hdr(str(out1 / "x0.hdr"))
    for i in range(3):
        b = read_hdr(str(out2 / f"x{i}.hdr"))
        assert np.isfinite(b).all()
        np.testing.assert_allclose(ref, b, rtol=2e-2, atol=1e-4)


def test_cli_compilation_cache_flag(tmp_path):
    """--compilation-cache DIR turns on jax's persistent XLA cache so a
    later process skips recompiling (10-60 s per unique graph on the
    tunneled runtime). Verified by cache entries appearing after a CLI
    run."""
    PIL = pytest.importorskip("PIL.Image")
    indir = tmp_path / "in"
    indir.mkdir()
    img = (np.random.default_rng(0).uniform(0, 1, (H, W, 3)) * 255
           ).astype(np.uint8)
    PIL.fromarray(img).save(str(indir / "x.jpg"))

    from skyhdr.cli.inference import main as infer_main

    cache = tmp_path / "xla_cache"
    try:
        infer_main(["--indir", str(indir), "--outdir", str(tmp_path / "out"),
                    "--imheight", str(H), "--imwidth", str(W),
                    "--workdir", str(tmp_path),
                    "--compilation-cache", str(cache)])
        assert cache.is_dir() and any(cache.iterdir())
    finally:
        # The cache dir is process-global jax config; detach it so later
        # tests don't keep writing into this (removed) tmp dir.
        jax.config.update("jax_compilation_cache_dir", None)


def test_restore_model_vars_priority(tmp_path, cfg):
    """cli.common.restore_model_vars (the serving restore path): SKY
    provides gen+sun, a SUN checkpoint overrides sun_vars, absence of both
    falls back to a fresh init — with no optimizer moments ever restored."""
    from skyhdr.cli.common import restore_model_vars
    from skyhdr.train.engine import create_gan_state

    gan = create_gan_state(cfg, jax.random.PRNGKey(1))
    sun = create_sun_state(cfg, jax.random.PRNGKey(2))
    ck = os.path.join(str(tmp_path), cfg.train.checkpoint_dir)
    CheckpointManager(os.path.join(ck, "SKY")).save(3, gan)
    CheckpointManager(os.path.join(ck, "SUN")).save(5, sun)

    gen_vars, sun_vars = restore_model_vars(cfg, str(tmp_path),
                                            log=lambda *a: None)
    for x, y in zip(jax.tree_util.tree_leaves(gan.gen_vars),
                    jax.tree_util.tree_leaves(gen_vars)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # SUN checkpoint wins over the SKY state's sun_vars.
    for x, y in zip(jax.tree_util.tree_leaves(sun.sun_vars),
                    jax.tree_util.tree_leaves(sun_vars)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # No checkpoints at all: fresh init, deterministic in the seed.
    g0, s0 = restore_model_vars(cfg, str(tmp_path / "empty"), seed=4,
                                log=lambda *a: None)
    g1, s1 = restore_model_vars(cfg, str(tmp_path / "empty"), seed=4,
                                log=lambda *a: None)
    for x, y in zip(jax.tree_util.tree_leaves((g0, s0)),
                    jax.tree_util.tree_leaves((g1, s1))):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_cli_evaluate_smoke(tmp_path):
    root = _write_dataset(str(tmp_path / "data"))
    from skyhdr.cli.evaluate import main as eval_main
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        eval_main(["--dir", os.path.join(root, "test"),
                   "--imheight", str(H), "--imwidth", str(W),
                   "--batchsize", "2", "--workdir", str(tmp_path),
                   "--max-batches", "1"])
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["images"] == 2
    assert np.isfinite(out["psnr"]) and np.isfinite(out["si_rmse"])


def test_cli_train_sun_epoch_dumps(tmp_path):
    """Per-epoch visual dumps match the reference's set (train_sun.py:
    353-373): sun_cam1/2/3 + pred + sungt grids and a one-time groundTruth
    HDR dump, labeled by the authoritative state epoch."""
    pytest.importorskip("matplotlib")
    root = _write_dataset(str(tmp_path / "data"))
    from skyhdr.cli.train_sun import main as sun_main

    sun_main(["--train", "true", "--dir", root,
              "--imheight", str(H), "--imwidth", str(W),
              "--batchsize", "2", "--epochs", "1", "--ckpt-every", "1",
              "--workdir", str(tmp_path), "--outputimg-every", "1"])
    val = tmp_path / "outputImg" / "SUN" / "val"
    for name in ("pred", "sungt", "sun_cam1", "sun_cam2", "sun_cam3"):
        assert (val / name / "epoch1.png").exists(), name
    gts = list((tmp_path / "outputImg" / "SUN" / "groundTruth").glob("*.hdr"))
    assert len(gts) == 2  # last eval batch, batchsize 2
    from skyhdr.utils.io import read_hdr

    assert np.isfinite(read_hdr(str(gts[0]))).all()


def test_cli_train_sun_eval_mode_six_panels(tmp_path):
    """--train false renders the reference's 6-panel figure
    (train_sun.py:449-471): CAM1-3, pred, CAM-gated pred, source HDR."""
    pytest.importorskip("matplotlib")
    from skyhdr.utils.io import write_hdr

    hdr_dir = tmp_path / "hdrs"
    hdr_dir.mkdir()
    rng = np.random.default_rng(3)
    img = (rng.uniform(0, 1, size=(H, W, 3)) ** 2 * 4).astype(np.float32)
    img[5, 30] = 300.0
    write_hdr(str(hdr_dir / "scene.hdr"), img)

    from skyhdr.cli.train_sun import main as sun_main

    sun_main(["--train", "false", "--inference_img_dir", str(hdr_dir),
              "--imheight", str(H), "--imwidth", str(W),
              "--workdir", str(tmp_path)])
    panel = tmp_path / "outputImg" / "SUN" / "eval" / "scene.png"
    assert panel.exists()


def test_train_loop_chunked_dispatch_matches_per_step(tmp_path, cfg):
    """steps_per_dispatch scans N batches in one jitted call; the key
    sequence and update order are unchanged, so training must match the
    per-step path (TrainLoop._flush_chunk).

    Tolerances: per-step loss metrics from a scanned chunk match the eager
    path to ~1e-6 (tested tightly in test_chunked_scan_metrics_match_eager);
    PARAMS can only match loosely — Adam's m/sqrt(v) update is scale-free,
    so compilation-level gradient roundoff on near-zero DoG gradients
    produces O(learning_rate) parameter differences (measured 2.3e-4 after
    two steps with bit-identical losses). A keys/batches/order bug would
    produce O(1) differences; assert within a few learning-rates."""
    import dataclasses

    root = _write_dataset(str(tmp_path / "data"), n=6)
    banks = load_banks(cfg, dorf_path=None, log=lambda *a: None)

    finals = {}
    for chunk in (1, 2):
        cfg_c = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           steps_per_dispatch=chunk))
        train_ds = PanoramaDataset(os.path.join(root, "train"),
                                   imshape=(H, W, 3), batch_size=2,
                                   shuffle=False)
        test_ds = PanoramaDataset(os.path.join(root, "test"),
                                  imshape=(H, W, 3), batch_size=2,
                                  shuffle=False)
        state = create_sun_state(cfg_c, jax.random.PRNGKey(0))
        loop = TrainLoop(cfg_c, "SUN", state,
                         make_sun_train_step(cfg_c, banks),
                         make_sun_eval_step(cfg_c, banks),
                         train_ds, test_ds,
                         workdir=str(tmp_path / f"w{chunk}"),
                         log=lambda *a: None)
        finals[chunk] = loop.run(epochs=1)

    assert int(finals[1].step) == int(finals[2].step) == 3
    a = jax.tree_util.tree_leaves(finals[1].sun_vars["params"])
    b = jax.tree_util.tree_leaves(finals[2].sun_vars["params"])
    lr = cfg.train.learning_rate
    for x, y in zip(a, b):
        assert float(jnp.abs(x - y).max()) < 10 * lr


def test_chunked_scan_metrics_match_eager(cfg):
    """The scanned multi-step body must reproduce the eager per-step losses
    exactly (same batches, same keys): this is the tight invariant behind
    the chunked dispatch (params are Adam-amplified, see above)."""
    from skyhdr.data.degradation import DegradationBanks
    from skyhdr.utils.io import get_exposure_lists, make_synthetic_dorf

    banks = DegradationBanks(
        crfs=jnp.asarray(make_synthetic_dorf(8, 256)),
        exposures=jnp.asarray(get_exposure_lists()[1]))
    step = make_sun_train_step(cfg, banks)
    rng = np.random.default_rng(0)
    batches = [{"hdr": jnp.asarray(rng.uniform(0, 2, (2, H, W, 3))
                                   .astype(np.float32)),
                "elevation": jnp.asarray([5.0, 9.0])} for _ in range(2)]
    keys = [jax.random.PRNGKey(i + 1) for i in range(2)]

    s = create_sun_state(cfg, jax.random.PRNGKey(0))
    eager = []
    for b, k in zip(batches, keys):
        s, m = step(s, b, k)
        eager.append(m)

    def run_chunk(state, bs, ks):
        def body(st, bk):
            return step(st, *bk)
        return jax.lax.scan(body, state, (bs, ks))

    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)
    _, scanned = jax.jit(run_chunk)(
        create_sun_state(cfg, jax.random.PRNGKey(0)), stacked,
        jnp.stack(keys))
    for i, m in enumerate(eager):
        for k, v in m.items():
            np.testing.assert_allclose(float(scanned[k][i]), float(v),
                                       rtol=1e-5, atol=1e-8)
