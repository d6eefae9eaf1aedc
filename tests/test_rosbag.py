"""Pure-python ROS1 bag round-trip: writer -> reader -> deserializers ->
full extraction into a dataset dir."""

import numpy as np

from tpufusion.data.rosbag_reader import (
    RADAR_TRACKS_DEFINITION,
    BagReader,
    BagWriter,
    extract_bag_points,
    parse_image,
    parse_pointcloud2,
    parse_radar_tracks,
    serialize_image,
    serialize_pointcloud2,
    serialize_radar_tracks,
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


def test_lz4_block_and_frame_roundtrip(rng):
    from tpufusion.data.lz4 import (
        lz4_block_compress,
        lz4_block_decompress,
        lz4_frame_compress,
        lz4_frame_decompress,
    )

    cases = [
        b"",
        b"a",
        b"abc" * 4000,  # highly compressible
        bytes(rng.integers(0, 256, 70000).astype(np.uint8)),  # incompressible
        bytes(rng.integers(0, 4, 150000).astype(np.uint8)),  # mixed
        b"overlap" + b"x" * 3 + b"overlapoverlapoverlap",  # overlapping match
    ]
    for c in cases:
        assert lz4_block_decompress(lz4_block_compress(c)) == c
        assert lz4_frame_decompress(lz4_frame_compress(c)) == c
    # compressible data actually compresses
    big = b"lidar frame " * 10000
    assert len(lz4_frame_compress(big)) < len(big) // 10


def test_bag_chunk_compressions(tmp_path, rng):
    pts = rng.normal(0, 20, (2000, 4)).astype(np.float32)
    for comp in ("none", "bz2", "lz4"):
        w = BagWriter(compression=comp)
        w.add_connection(0, "/velodyne_points", "sensor_msgs/PointCloud2")
        w.add_message(0, 1_000, serialize_pointcloud2(pts))
        path = tmp_path / f"c_{comp}.bag"
        w.write(str(path))
        msgs = list(BagReader(str(path)).read_messages())
        assert len(msgs) == 1
        np.testing.assert_allclose(parse_pointcloud2(msgs[0].raw), pts)


def test_radar_tracks_roundtrip(tmp_path):
    tracks = [
        {"range": 12.5, "angle": -3.0, "rate": 1.5, "status": 3,
         "number": 7, "moving": True, "power": -2.5},
        {"range": 40.0, "angle": 10.0, "accel": 0.5, "late_rate": 0.25,
         "width": 1.5, "absolute_rate": -4.0},
    ]
    w = BagWriter(compression="lz4")
    w.add_connection(0, "/radar/tracks", "radar_driver/RadarTracks",
                     message_definition=RADAR_TRACKS_DEFINITION)
    w.add_message(0, 5_000, serialize_radar_tracks(tracks, 5_000))
    path = tmp_path / "radar.bag"
    w.write(str(path))
    msgs = list(BagReader(str(path)).read_messages())
    rows = parse_radar_tracks(msgs[0])
    assert len(rows) == 2
    # the reference's 11 parse_msg fields + timestamp (radar_tracks.py:10-33)
    for k in ("timestamp", "status", "number", "range", "rate", "accel",
              "angle", "width", "late_rate", "moving", "power",
              "absolute_rate"):
        assert k in rows[0], k
    assert rows[0]["timestamp"] == 5_000
    assert abs(rows[0]["range"] - 12.5) < 1e-6
    assert rows[0]["moving"] is True
    assert abs(rows[1]["absolute_rate"] + 4.0) < 1e-6


def test_rosmsg_generic_nested():
    from tpufusion.data.rosmsg import decode_message, encode_message

    definition = """\
Header header
string name
float64[3] triple
Inner[] items
================================================================================
MSG: std_msgs/Header
uint32 seq
time stamp
string frame_id
================================================================================
MSG: pkg/Inner
int16 a
uint64 b
bool flag
"""
    msg = {
        "header": {"seq": 42, "stamp": 1_500_000_000_123,
                   "frame_id": "velodyne"},
        "name": "obstacle",
        "triple": [1.5, -2.5, 3.25],
        "items": [
            {"a": -7, "b": 2**40, "flag": True},
            {"a": 100, "b": 0, "flag": False},
        ],
    }
    raw = encode_message(msg, definition)
    got = decode_message(raw, definition)
    assert got["header"]["frame_id"] == "velodyne"
    assert got["header"]["stamp"] == 1_500_000_000_123
    assert got["name"] == "obstacle"
    np.testing.assert_allclose(np.asarray(got["triple"]), msg["triple"])
    assert got["items"][0] == {"a": -7, "b": 2**40, "flag": True}
    assert got["items"][1]["flag"] is False


def test_image_roundtrip(rng):
    gray = rng.integers(0, 255, (32, 48)).astype(np.uint8)
    img, enc = parse_image(serialize_image(gray, "mono8"))
    assert enc == "mono8"
    np.testing.assert_array_equal(img, gray)
    rgb = rng.integers(0, 255, (32, 48, 3)).astype(np.uint8)
    img, enc = parse_image(serialize_image(rgb, "rgb8"))
    assert enc == "rgb8"
    np.testing.assert_array_equal(img, rgb)


def test_extract_bag_dataset_full(tmp_path, rng):
    """.bag with clouds + images + radar -> one-call dataset dir
    (the extract_rosbag.py main equivalent)."""
    import os

    from tpufusion.config import RangeViewSpec
    from tpufusion.data.etl import (
        extract_bag_dataset,
        load_camera_extracted,
        process_camera_frame,
    )

    w = BagWriter(compression="lz4")
    w.add_connection(0, "/velodyne_points", "sensor_msgs/PointCloud2")
    w.add_connection(1, "/image_raw", "sensor_msgs/Image")
    w.add_connection(2, "/radar/tracks", "radar_driver/RadarTracks",
                     message_definition=RADAR_TRACKS_DEFINITION)
    t0 = 1_490_000_000_000_000_000
    raw_imgs = []
    for i in range(3):
        pts = rng.normal(0, 20, (600, 4)).astype(np.float32)
        w.add_message(0, t0 + i * 100_000_000, serialize_pointcloud2(pts))
        img = rng.integers(0, 255, (64, 80, 3)).astype(np.uint8)
        raw_imgs.append(img)
        w.add_message(1, t0 + 30_000_000 + i * 100_000_000,
                      serialize_image(img, "rgb8"))
    w.add_message(2, t0 + 50_000_000,
                  serialize_radar_tracks([{"range": 20.0, "angle": 4.0}],
                                         t0 + 50_000_000))
    bag = tmp_path / "full.bag"
    w.write(str(bag))

    out = tmp_path / "ds"
    crop = (10, 42)
    report = extract_bag_dataset(
        str(bag), str(out), crop=crop,
        spec=RangeViewSpec(res_h_deg=1.8), save_png=True,
    )
    assert report["frames"] == 3
    cam = load_camera_extracted(str(out))
    assert cam["images"].shape == (3, 32, 80)
    expect = process_camera_frame(raw_imgs[0], "rgb8", None, crop)
    np.testing.assert_array_equal(cam["images"][0], expect)
    assert os.path.exists(out / "radar" / "radar_tracks.csv")
    assert os.path.exists(out / "camera_timestamps.csv")
    pngs = sorted(os.listdir(out / "camera"))
    assert len(pngs) == 3 and pngs[0].endswith("_image.png")
    # radar CSV is loadable by the radar track consumer
    from tpufusion.data.radar import load_radar_csv

    tracks = load_radar_csv(str(out / "radar" / "radar_tracks.csv"))
    assert len(tracks) == 1 and abs(tracks[0].range - 20.0) < 1e-6


def test_lz4_decompress_enforces_declared_size():
    """A stream that expands past the declared chunk size must raise —
    and must not first materialize the oversized output (the native
    decoder treats the size hint as a hard bound, erroring mid-decode
    instead of growing the buffer)."""
    import pytest

    from tpufusion.data.lz4 import lz4_block_compress, lz4_block_decompress

    comp = lz4_block_compress(b"x" * 200_000)
    assert lz4_block_decompress(comp, max_size=200_000) == b"x" * 200_000
    with pytest.raises(ValueError):
        lz4_block_decompress(comp, max_size=1000)

    from tpufusion.native import get_fastpoints

    fp = get_fastpoints()
    if fp is not None and hasattr(fp, "lz4_decompress"):
        with pytest.raises(ValueError):
            fp.lz4_decompress(comp, 1000)


def test_lz4_native_python_cross_compatibility(rng):
    """Native and pure-python codec halves must interoperate in every
    direction (native-compressed -> python-decoded and vice versa): the
    native codec (fastpoints.c) is a fast path, not a format fork."""
    import unittest.mock as um

    import pytest

    import tpufusion.data.lz4 as L
    from tpufusion.native import get_fastpoints

    fp = get_fastpoints()
    if fp is None or not hasattr(fp, "lz4_frame_decompress"):
        pytest.skip("native extension unavailable")

    def py(fn, *a, **k):
        with um.patch("tpufusion.native.get_fastpoints", lambda: None):
            return fn(*a, **k)

    cases = [
        b"",
        b"abc" * 4000,
        bytes(rng.integers(0, 256, (1 << 16) + 7).astype(np.uint8)),
        bytes(rng.integers(0, 3, 150_000).astype(np.uint8)),
    ]
    for c in cases:
        for blk in (fp.lz4_compress(c), py(L.lz4_block_compress, c)):
            assert py(L.lz4_block_decompress, blk) == c
            assert fp.lz4_decompress(blk, -1) == c
        for frm in (fp.lz4_frame_compress(c, 1 << 16),
                    py(L.lz4_frame_compress, c)):
            assert py(L.lz4_frame_decompress, frm) == c
            assert fp.lz4_frame_decompress(frm, -1) == c
            # the declared-size hint is exact and a hard bound in both
            assert L.lz4_frame_decompress(frm, len(c)) == c
            if len(c) > 1:
                with pytest.raises(ValueError):
                    fp.lz4_frame_decompress(frm, len(c) - 1)
                with pytest.raises(ValueError):
                    py(L.lz4_frame_decompress, frm, len(c) - 1)


def test_lz4_block_linked_frame_decodes():
    """Frames whose blocks back-reference earlier blocks' output (roslz4
    streaming can emit these) decode in both implementations: blocks are
    decoded into one contiguous buffer, offsets bounded by total output."""
    import struct
    import unittest.mock as um

    import tpufusion.data.lz4 as L

    # block 1: 8 literals. block 2: 0 literals then a match reaching 8
    # bytes back — i.e. entirely into block 1's output.
    b1 = bytes([8 << 4]) + b"ABCDEFGH"
    b2 = bytes([(0 << 4) | 0]) + struct.pack("<H", 8) + bytes([0 << 4])
    frame = struct.pack("<I", L.LZ4_FRAME_MAGIC) + bytes([1 << 6, 0x40, 0])
    for blk in (b1, b2):
        frame += struct.pack("<I", len(blk)) + blk
    frame += struct.pack("<I", 0)
    want = b"ABCDEFGH" + b"ABCD"
    with um.patch("tpufusion.native.get_fastpoints", lambda: None):
        assert L.lz4_frame_decompress(frame) == want
    from tpufusion.native import get_fastpoints

    fp = get_fastpoints()
    if fp is not None and hasattr(fp, "lz4_frame_decompress"):
        assert fp.lz4_frame_decompress(frame, -1) == want


def test_multi_chunk_bag_roundtrip(tmp_path, rng):
    """BagWriter splits chunks at the threshold (like rosbag's writer);
    the streaming reader yields every message in file order across chunk
    boundaries, for every compression. Each chunk is self-contained
    (connection records replayed per chunk)."""
    pts = rng.normal(0, 20, (40, 500, 4)).astype(np.float32)
    for comp in ("none", "lz4"):
        w = BagWriter(compression=comp, chunk_threshold=32_768)
        w.add_connection(0, "/velodyne_points", "sensor_msgs/PointCloud2")
        for i in range(40):
            w.add_message(0, 1_000_000 * i, serialize_pointcloud2(pts[i]))
        path = str(tmp_path / f"multi_{comp}.bag")
        w.write(path)
        # more than one chunk actually written
        n_chunks = 0
        with open(path, "rb") as f:
            f.readline()
            from tpufusion.data.rosbag_reader import _iter_file_records

            for header, _ in _iter_file_records(f):
                n_chunks += header.get("op", b"\x00")[0] == 0x05
        assert n_chunks > 1, f"{comp}: expected multiple chunks"
        msgs = list(BagReader(path).read_messages())
        assert len(msgs) == 40
        assert [m.timestamp for m in msgs] == [1_000_000 * i for i in range(40)]
        got = parse_pointcloud2(msgs[17].raw)
        np.testing.assert_allclose(got, pts[17], rtol=1e-6)


def test_streaming_extract_matches_inram(tmp_path, rng):
    """streaming=True (two passes, memmap .npy outputs, one projection
    batch in RAM) produces the same tensors, timestamps, GT CSVs, and
    radar CSV as the in-RAM .npz path — including duplicate-timestamp
    dedup and tracklet interpolation. load_extracted reads both layouts."""
    import filecmp
    import os

    from tpufusion.config import RangeViewSpec
    from tpufusion.data.etl import (
        extract_bag_dataset,
        load_camera_extracted,
        load_extracted,
    )
    from tpufusion.eval.tracklet_xml import Tracklet, TrackletCollection

    w = BagWriter(compression="lz4")
    w.add_connection(0, "/velodyne_points", "sensor_msgs/PointCloud2")
    w.add_connection(1, "/image_raw", "sensor_msgs/Image")
    w.add_connection(2, "/radar/tracks", "radar_driver/RadarTracks",
                     message_definition=RADAR_TRACKS_DEFINITION)
    t0 = 1_490_000_000_000_000_000
    n_frames = 7
    tr = Tracklet("Car", l=4.2, w=1.6, h=1.5)
    for i in range(n_frames):
        # varying cloud sizes exercise padding; one duplicate timestamp
        # exercises dedup in both paths
        ts = t0 + (i if i != 3 else 2) * 100_000_000
        pts = rng.normal(0, 20, (400 + 60 * i, 4)).astype(np.float32)
        w.add_message(0, ts, serialize_pointcloud2(pts))
        img = rng.integers(0, 255, (64, 80, 3)).astype(np.uint8)
        w.add_message(1, ts + 30_000_000, serialize_image(img, "rgb8"))
        tr.poses.append({"tx": 10.0 + i, "ty": -2.0, "tz": -1.0,
                         "rx": 0.0, "ry": 0.0, "rz": 0.02 * i})
    w.add_message(2, t0 + 50_000_000,
                  serialize_radar_tracks([{"range": 20.0, "angle": 4.0}],
                                         t0 + 50_000_000))
    bag = tmp_path / "s.bag"
    w.write(str(bag))
    gt_xml = tmp_path / "gt.xml"
    TrackletCollection([tr]).write_xml(str(gt_xml))

    spec = RangeViewSpec(res_h_deg=1.8)
    kw = dict(tracklet_xml=str(gt_xml), crop=(10, 42),
              spec=spec, save_png=False)
    rep_a = extract_bag_dataset(str(bag), str(tmp_path / "inram"),
                                streaming=False, **kw)
    rep_b = extract_bag_dataset(str(bag), str(tmp_path / "stream"),
                                streaming=True, batch=4, **kw)
    assert rep_b.pop("streaming") is True
    assert rep_a == rep_b  # frames, max gaps, gt counts

    a = load_extracted(str(tmp_path / "inram"))
    b = load_extracted(str(tmp_path / "stream"))
    assert os.path.exists(tmp_path / "stream" / "lidar_frames.npy")
    np.testing.assert_array_equal(a["timestamps"], b["timestamps"])
    np.testing.assert_allclose(a["images"], np.asarray(b["images"]),
                               atol=1e-6)
    ca = load_camera_extracted(str(tmp_path / "inram"))
    cb = load_camera_extracted(str(tmp_path / "stream"))
    np.testing.assert_array_equal(ca["images"], np.asarray(cb["images"]))
    np.testing.assert_array_equal(ca["timestamps"], cb["timestamps"])
    for f in ("obs_poses_interp_transform.csv", "obs_poses_camera.csv",
              "lidar_timestamps.csv", "camera_timestamps.csv",
              os.path.join("radar", "radar_tracks.csv")):
        assert filecmp.cmp(tmp_path / "inram" / f, tmp_path / "stream" / f,
                           shallow=False), f
