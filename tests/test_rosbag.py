"""Pure-python ROS1 bag round-trip: writer -> reader -> deserializers ->
full extraction into a dataset dir."""

import numpy as np

from tpufusion.data.rosbag_reader import (
    BagReader,
    BagWriter,
    extract_bag_points,
    parse_pointcloud2,
    serialize_pointcloud2,
)


def _write_demo_bag(path, rng, frames=4, n=500):
    w = BagWriter()
    w.add_connection(0, "/velodyne_points", "sensor_msgs/PointCloud2")
    clouds = []
    for i in range(frames):
        pts = rng.normal(0, 20, (n, 4)).astype(np.float32)
        clouds.append(pts)
        w.add_message(0, 1_490_000_000_000_000_000 + i * 100_000_000,
                      serialize_pointcloud2(pts))
    w.write(str(path))
    return clouds


def test_bag_roundtrip(tmp_path, rng):
    path = tmp_path / "demo.bag"
    clouds = _write_demo_bag(path, rng)
    reader = BagReader(str(path))
    msgs = list(reader.read_messages(topics=["/velodyne_points"]))
    assert len(msgs) == 4
    assert msgs[0].msg_type == "sensor_msgs/PointCloud2"
    got = parse_pointcloud2(msgs[0].raw)
    np.testing.assert_allclose(got, clouds[0], rtol=1e-6)
    assert msgs[1].timestamp - msgs[0].timestamp == 100_000_000


def test_native_extractor_matches_numpy(rng):
    from tpufusion.native import get_fastpoints

    pts = rng.normal(0, 20, (4096, 4)).astype(np.float32)
    raw = serialize_pointcloud2(pts)
    b = parse_pointcloud2(raw, use_native=False)
    np.testing.assert_allclose(b, pts, rtol=1e-6)
    if get_fastpoints() is None:
        import pytest

        pytest.skip("C toolchain unavailable; numpy fallback covered above")
    a = parse_pointcloud2(raw, use_native=True)
    np.testing.assert_array_equal(a, b)
    # absent field -> NaN column in both paths
    a2 = parse_pointcloud2(raw, want=("x", "ring"), use_native=True)
    b2 = parse_pointcloud2(raw, want=("x", "ring"), use_native=False)
    assert np.isnan(a2[:, 1]).all() and np.isnan(b2[:, 1]).all()
    np.testing.assert_array_equal(a2[:, 0], b2[:, 0])


def test_pointcloud2_missing_field(rng):
    # cloud without intensity: NaN-filled column
    pts = rng.normal(0, 5, (10, 4)).astype(np.float32)
    raw = serialize_pointcloud2(pts)
    got = parse_pointcloud2(raw, want=("x", "y", "z", "ring"))
    np.testing.assert_allclose(got[:, :3], pts[:, :3], rtol=1e-6)
    assert np.isnan(got[:, 3]).all()


def test_extract_bag_points(tmp_path, rng):
    path = tmp_path / "demo.bag"
    clouds = _write_demo_bag(path, rng, frames=3, n=200)
    frames, ts = extract_bag_points(str(path))
    assert frames.shape == (3, 200, 4)
    assert len(ts) == 3
    np.testing.assert_allclose(frames[2], clouds[2], rtol=1e-6)


def test_bag_to_dataset(tmp_path, rng):
    from tpufusion.config import RangeViewSpec
    from tpufusion.data.etl import extract_dataset, load_extracted

    path = tmp_path / "demo.bag"
    _write_demo_bag(path, rng, frames=4, n=800)
    frames, ts = extract_bag_points(str(path))
    out = tmp_path / "ds"
    spec = RangeViewSpec(res_h_deg=1.8)
    report = extract_dataset(str(out), frames, ts, spec=spec)
    assert report["frames"] == 4
    data = load_extracted(str(out))
    assert data["images"].shape == (4, spec.height, spec.width, 3)
