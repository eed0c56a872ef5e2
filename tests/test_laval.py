"""Laval Sky DB extraction end-to-end on a synthesized mini-database, plus a
golden test of align_sunpose vs the reference's per-column loop."""

import os

import numpy as np
import pytest

from skyhdr.data.laval import align_sunpose, extract_laval, make_tfrecords
from skyhdr.data.pipeline import PanoramaDataset


def _align_ref(img, sun_azimuth, imshape, resize):
    """Transcription of reference loadLavalSkyDB.py:16-35 (alignSunpose)."""
    img = resize(img, (imshape[0], int(imshape[1] * 2)))
    h, w, _ = img.shape
    img = img[: int(h / 2), :, :]
    newimg = np.zeros_like(img)
    for i in range(w):
        new_loc = i - sun_azimuth
        if new_loc < 0:
            new_loc += imshape[0]
        if new_loc >= imshape[0]:
            new_loc -= imshape[0]
        newimg[:, new_loc, :] = img[:, i, :]
    return newimg


def test_align_sunpose_matches_reference(rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.uniform(0, 5, size=(20, 40, 3)).astype(np.float32)
    for az in (0, 7, 63, 127):
        ours = align_sunpose(img, az, (128, 32))
        ref = _align_ref(img, az, (128, 32), cv2.resize)
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def _synth_laval(root, rng):
    """Mini Laval-shaped DB using this framework's own RGBE codec (the CI
    OpenCV build has no EXR writer; extract_laval takes an injected reader)."""
    from skyhdr.utils.io import write_hdr

    import pandas as pd

    dates = ["20200101", "20200102"]
    times = ["090000", "120000"]
    for date in dates:
        rows = []
        for j, t in enumerate(times):
            d = os.path.join(root, "envmap", date, t)
            os.makedirs(d, exist_ok=True)
            img = (rng.uniform(0, 1, size=(64, 128, 3)) ** 2 * 3).astype(np.float32)
            write_hdr(os.path.join(d, "envmap.hdr"), img)
            rows.append({
                "Datetime": "{}-{}-{} {}:{}:{}".format(
                    date[:4], date[4:6], date[6:8], t[:2], t[2:4], t[4:6]),
                "Sun elevation": np.deg2rad(30.0 + 10 * j),  # zenith, radians
                "Sun azimuth": np.deg2rad(120.0 + 30 * j),
            })
        os.makedirs(os.path.join(root, "csv_day"), exist_ok=True)
        pd.DataFrame(rows).to_csv(os.path.join(root, "csv_day", date),
                                  index=False)
    return root


def test_extract_and_tfrecord_end_to_end(tmp_path, rng):
    pytest.importorskip("cv2")
    pytest.importorskip("pandas")
    from skyhdr.utils.io import read_hdr

    db = _synth_laval(str(tmp_path / "laval"), rng)
    out = str(tmp_path / "out")
    os.makedirs(out, exist_ok=True)
    # First 3 images train, remainder test.
    train_dir, test_dir = extract_laval(
        db, out, size_wh=(64, 16), img_bias=1e-6, train_split_count=3,
        envmap_name="envmap.hdr",
        imread=lambda p: read_hdr(p)[..., ::-1],  # BGR like cv2
        log=lambda *a: None)
    assert os.path.exists(os.path.join(train_dir, "train_refine.csv"))
    assert os.path.exists(os.path.join(test_dir, "test_refine.csv"))
    n_train = len(os.listdir(os.path.join(train_dir, "hdr")))
    n_test = len(os.listdir(os.path.join(test_dir, "hdr")))
    assert n_train == 3 and n_test == 1

    make_tfrecords(out, size_wh=(64, 16), log=lambda *a: None)
    ds = PanoramaDataset(os.path.join(out, "dataset_64_16", "tfrecord", "train"),
                         imshape=(16, 64, 3), batch_size=3, shuffle=False)
    batch = next(iter(ds))
    assert batch["hdr"].shape == (3, 16, 64, 3)
    # Mean-normalized (train.py:109-110).
    np.testing.assert_allclose(
        batch["hdr"].reshape(3, -1).mean(-1), 0.5, rtol=1e-3)
    assert np.isfinite(batch["elevation"]).all()
