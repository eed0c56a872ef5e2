"""Real-asset ingestion end-to-end (VERDICT r2 item 2 of 'What's missing').

The two user-supplied assets — `dorfCurves.txt` (reference utils.py:105-116,
gitignored by the reference's *.txt rule) and `vgg16.npy` (SingleHDR's VGG
weights, reference vgg16.py:99, README.md:69-70) — are absent from this
environment, so every training run so far used the synthetic stand-ins.
These tests pin the PARSERS to the assets' exact formats and drive them
through the training CLI with no fallbacks:

  * tests/fixtures/dorfCurves.txt.gz — a checked-in 201-curve file in the
    DoRF database's exact 6-line record format (tools/make_dorf_fixture.py);
    201 matches the real file so the reference's 175/26 train/test split
    (utils.py:111-114) leaves both banks non-empty.
  * a `vgg16.npy` written here in SingleHDR's exact layout: np.save of a
    dict {layer_name: [filter_HWIO, bias]} read back with encoding='latin1',
    allow_pickle=True (reference vgg16.py:99), including extra keys
    (conv4_*/fc*) that the loader must ignore.
"""

import gzip
import os
import shutil

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "dorfCurves.txt.gz")
H, W = 16, 64


@pytest.fixture()
def dorf_path(tmp_path):
    out = tmp_path / "dorfCurves.txt"
    with gzip.open(FIXTURE, "rb") as src, open(out, "wb") as dst:
        shutil.copyfileobj(src, dst)
    return str(out)


@pytest.fixture()
def vgg_path(tmp_path):
    from skyhdr.models.vgg16 import _LAYERS

    rng = np.random.default_rng(3)
    data = {}
    for name, cin, cout in _LAYERS:
        data[name] = [rng.normal(0, 0.05, (3, 3, cin, cout)).astype(np.float32),
                      rng.normal(0, 0.05, (cout,)).astype(np.float32)]
    # The real SingleHDR file also carries conv4_*/conv5_*/fc* entries the
    # pool3-truncated backbone never reads (reference vgg16.py:112-124 stops
    # at pool3 for the perceptual loss) — the loader must skip them.
    data["conv4_1"] = [rng.normal(0, 0.05, (3, 3, 256, 512)).astype(np.float32),
                      np.zeros((512,), np.float32)]
    data["fc6"] = [np.zeros((4, 4), np.float32), np.zeros((4,), np.float32)]
    out = tmp_path / "vgg16.npy"
    np.save(out, data)
    return str(out)


def test_dorf_fixture_parses_with_reference_semantics(dorf_path):
    """load_dorf_curves must reproduce the reference split: first 175 curves
    -> train, remainder -> test (utils.py:111-114), 1024 samples each,
    monotone 0..1."""
    from skyhdr.utils.io import load_dorf_curves

    train, test = load_dorf_curves(dorf_path)
    assert train.shape == (175, 1024)
    assert test.shape == (26, 1024)
    for bank in (train, test):
        np.testing.assert_allclose(bank[:, 0], 0.0, atol=1e-4)
        np.testing.assert_allclose(bank[:, -1], 1.0, atol=1e-4)
        assert np.all(np.diff(bank, axis=1) >= -1e-4)

    # The parser indexes line idx+5 of each 6-line record — cross-check one
    # curve against the raw text to pin the record layout.
    with open(dorf_path) as f:
        lines = [l.strip() for l in f.readlines()]
    assert lines[2].startswith("I =") and lines[4].startswith("B =")
    row0 = np.fromstring(lines[5], sep=" ")
    np.testing.assert_allclose(train[0], row0, atol=1e-6)


def test_vgg16_npy_loader_layout(vgg_path):
    """load_vgg16_npy reads the SingleHDR dict layout and flips conv1_1's
    input channels BGR->RGB (this framework is RGB end-to-end)."""
    from skyhdr.models.vgg16 import load_vgg16_npy

    raw = np.load(vgg_path, encoding="latin1", allow_pickle=True).item()
    weights = load_vgg16_npy(vgg_path)
    assert set(weights) == {"conv1_1", "conv1_2", "conv2_1", "conv2_2",
                            "conv3_1", "conv3_2", "conv3_3"}
    np.testing.assert_array_equal(weights["conv1_1"][0],
                                  raw["conv1_1"][0][:, :, ::-1, :])
    np.testing.assert_array_equal(weights["conv2_2"][0], raw["conv2_2"][0])
    np.testing.assert_array_equal(weights["conv1_2"][1], raw["conv1_2"][1])


def test_train_cli_consumes_real_assets(tmp_path, dorf_path, vgg_path, capsys):
    """One GAN epoch through skyhdr.cli.train with --dorf/--vgg pointing at
    the exact-format fixtures: the real loaders must be used (no synthetic
    fallback messages) and the losses stay finite."""
    from skyhdr.data.records import write_tfrecord
    from skyhdr.cli.train import main as train_main
    from skyhdr.cli.train_sun import main as sun_main

    rng = np.random.default_rng(0)
    root = str(tmp_path / "data")
    for split in ("train", "test"):
        d = os.path.join(root, split)
        os.makedirs(d, exist_ok=True)
        for i in range(2):
            img = (rng.uniform(0, 1, (H, W, 3)) ** 2 * 3).astype(np.float32)
            write_tfrecord(os.path.join(d, f"{split}{i}.tfrecord"),
                           [{"image": img.tobytes(), "azimuth": 31.0,
                             "elevation": float(4 + i)}])

    common = ["--dir", root, "--imheight", str(H), "--imwidth", str(W),
              "--batchsize", "2", "--epochs", "1", "--ckpt-every", "1",
              "--workdir", str(tmp_path), "--dorf", dorf_path,
              "--vgg", vgg_path]
    sun_main(["--train", "true", "--outputimg-every", "0"] + common)
    train_main(common)
    out = capsys.readouterr().out
    assert "not found" not in out, out
    assert "Epoch 1" in out
