"""Reference on-disk layout reader: per-channel pickles + CSVs.

Fixtures emulate what `modules/lidar/process/extract_rosbag.py` wrote:
protocol-2 pickles of float arrays under lidar_360/<ts>_<chan>_float.lidar.p
plus the timestamp/GT CSVs.
"""

import csv
import os
import pickle

import numpy as np

from tpufusion.data.reference_reader import (
    ReferenceDirDataset,
    load_lidar_frame,
    load_timestamps,
)
from tpufusion.data.registry import DirSet, read_registry


def _make_reference_layout(root, rng, n_frames=3, h=32, w=64):
    lid = root / "lidar_360"
    lid.mkdir(parents=True)
    truth = []
    frames = {}
    for i in range(n_frames):
        ts = 1_490_000_000_000_000_000 + i * 100_000_000
        chans = {}
        for chan in ("distance", "height", "intensity"):
            arr = rng.random((h, w)).astype(np.float64)
            # protocol 2 = what python2 cPickle wrote
            with open(lid / f"{ts}_{chan}_float.lidar.p", "wb") as f:
                pickle.dump(arr, f, protocol=2)
            chans[chan] = arr
        frames[ts] = chans
        truth.append(
            {"timestamp": ts, "tx": 10.0 + i, "ty": -3.0, "tz": -0.7,
             "rx": 0.0, "ry": 0.0, "rz": 0.1 * i}
        )
    with open(root / "lidar_timestamps.csv", "w", newline="") as f:
        wr = csv.writer(f)
        wr.writerow(["timestamp"])
        for r in truth:
            wr.writerow([r["timestamp"]])
    with open(root / "obs_poses_interp_transform.csv", "w", newline="") as f:
        wr = csv.DictWriter(f, ["timestamp", "tx", "ty", "tz", "rx", "ry", "rz"])
        wr.writeheader()
        wr.writerows(truth)
    return frames, truth


def test_reference_layout_roundtrip(tmp_path, rng):
    frames, truth = _make_reference_layout(tmp_path / "ds", rng)
    ts0 = truth[0]["timestamp"]
    img = load_lidar_frame(str(tmp_path / "ds"), ts0)
    assert img.shape == (32, 64, 3) and img.dtype == np.float32
    np.testing.assert_allclose(img[..., 0], frames[ts0]["distance"], rtol=1e-6)
    np.testing.assert_allclose(img[..., 1], frames[ts0]["height"], rtol=1e-6)

    assert load_timestamps(str(tmp_path / "ds")) == [r["timestamp"] for r in truth]

    # full dataset through the registry
    meta = tmp_path / "meta.csv"
    meta.write_text("l,w,h\n4.2,1.6,1.5\n")
    reg = tmp_path / "registry.csv"
    reg.write_text("ds,meta.csv\n")
    (dirset,) = list(read_registry(str(reg), str(tmp_path)))
    assert dirset.obstacle_size == (4.2, 1.6, 1.5)

    data = ReferenceDirDataset(dirset)
    assert len(data) == 3
    fr = data.frame(1)
    np.testing.assert_allclose(fr["center"], [11.0, -3.0, -0.7], rtol=1e-6)
    arrays = data.to_arrays()
    assert arrays["image"].shape == (3, 32, 64, 3)
    np.testing.assert_allclose(arrays["yaw"], [0.0, 0.1, 0.2], rtol=1e-6)
