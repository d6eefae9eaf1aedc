"""Radar, tracker, visualization, PR curves, cloud augmentation, fusion
training driver."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from tpufusion.data.radar import RadarTrack, radar_features
from tpufusion.serve.tracker import PoseTracker


def test_radar_to_xyz():
    # reference semantics (process_radar_data.py:98-115): range += 2.2506
    # BEFORE projecting, tz = 0
    t = RadarTrack(timestamp=0, range=20.0, angle=0.0)
    np.testing.assert_allclose(t.to_xyz(), [22.2506, 0.0, 0.0])
    t2 = RadarTrack(timestamp=0, range=10.0, angle=90.0)
    np.testing.assert_allclose(t2.to_xyz(), [0.0, -12.2506, 0.0], atol=1e-12)
    feats = radar_features([t, t2])
    assert feats.shape == (2, 2) and feats[1, 1] == 90.0


def test_tracker_smooths_and_coasts():
    f = 40
    true = np.zeros((f, 7))
    true[:, 0] = 10.0 + 0.1 * np.arange(f)  # moving along x
    true[:, 4:7] = [4.0, 1.6, 1.5]
    rng = np.random.default_rng(0)
    noisy = true + rng.normal(0, 0.05, true.shape)
    found = np.ones(f, bool)
    found[15:18] = False  # dropout window
    noisy[20] += 8.0  # one wild outlier (gated away)

    tracked = PoseTracker(dt=1.0).run(noisy, found)
    # after warmup the track follows the truth closely, through the gap
    err = np.abs(tracked[5:, 0] - true[5:, 0])
    assert err.max() < 1.0, err.max()
    assert (tracked[16, 0] != 0.0), "coasted frame should carry a pose"


def test_visualize_renders(tmp_path, rng):
    from tests.conftest import synthetic_cloud
    from tpufusion.config import BevSpec, RangeViewSpec
    from tpufusion.geometry.bev import bev_rasterize
    from tpufusion.geometry.range_view import range_view_project
    from tpufusion.tools import visualize as viz

    spec = RangeViewSpec(res_h_deg=1.8)
    cloud = synthetic_cloud(rng, n=2000, with_vehicle_at=(12.0, -3.0, -0.7))
    img = np.asarray(range_view_project(jnp.asarray(cloud), spec))
    canvas = viz.render_range_view(
        img, center=(12.0, -3.0, -0.7), size=(4.2, 1.6, 1.5), yaw=0.0, spec=spec
    )
    assert canvas.shape == (spec.height, spec.width, 3)
    viz.save(str(tmp_path / "rv.png"), canvas)

    bev_spec = BevSpec()
    bev = np.asarray(bev_rasterize(jnp.asarray(cloud), bev_spec))
    canvas2 = viz.render_bev(
        bev, center=(12.0, -3.0, -0.7), size=(4.2, 1.6, 1.5), yaw=0.0, spec=bev_spec
    )
    assert canvas2.shape[2] == 3

    mask = viz.render_class_mask(img[..., 0] > 0, bbox=(10, 5, 60, 20))
    assert mask.shape == (spec.height, spec.width, 3)


def test_pr_curve_artifacts(tmp_path):
    from tpufusion.train.pr_curves import binned_pr, plot_pr_curves
    from tpufusion.train.trainer import MetricHistory

    h = MetricHistory()
    rng = np.random.default_rng(0)
    for i in range(10):
        h.record_epoch(
            {"loss": 1.0 / (i + 1), "precision": i / 10, "recall": i / 12},
            {"loss": 1.1 / (i + 1), "precision": i / 11, "recall": i / 13},
        )
    csv_path = tmp_path / "pr.csv"
    h.write_pr_csv(str(csv_path))
    paths = plot_pr_curves(str(csv_path), str(tmp_path / "out"))
    import os

    assert all(os.path.exists(p) for p in paths)
    centers, mins, means, maxs = binned_pr(
        rng.random(100), rng.random(100), n_bins=10
    )
    assert (mins <= means).all() and (means <= maxs).all()


def test_transform_point_cloud():
    from tpufusion.data.augment import transform_point_cloud

    pts = jnp.asarray([[1.0, 0.0, 0.5, 9.0], [0.0, 2.0, -0.5, 3.0]])
    out, (angle, tx, ty) = transform_point_cloud(jax.random.PRNGKey(0), pts)
    out = np.asarray(out)
    # z and intensity untouched
    np.testing.assert_allclose(out[:, 2:], np.asarray(pts[:, 2:]))
    # distances between points preserved under rigid transform
    d0 = np.linalg.norm(np.asarray(pts[0, :2]) - np.asarray(pts[1, :2]))
    d1 = np.linalg.norm(out[0, :2] - out[1, :2])
    np.testing.assert_allclose(d0, d1, rtol=1e-5)


@pytest.mark.slow
def test_fusion_training_driver():
    from tpufusion.config import CameraConfig, ModelConfig
    from tpufusion.models.fusion import FusionNet
    from tpufusion.train.fusion_trainer import (
        build_fusion_batches,
        predict_fusion,
        train_fusion,
    )

    cam_cfg = CameraConfig(width=201, height=64, channels=1)
    net = FusionNet(
        lidar_model=ModelConfig(),
        camera_model=ModelConfig(vertical_stride=2, use_regression=False),
        camera=cam_cfg,
        lidar_hw=(32, 201),
        rngs=nnx.Rngs(0),
    )
    f = 12
    rng = np.random.default_rng(0)
    data = build_fusion_batches(
        cam_images=rng.random((f, 64, 201, 1)).astype(np.float32),
        cam_ts=np.arange(f) * 100 + 5,
        cam_poses=np.tile([5.0, 1.0, -0.5, 0.3], (f, 1)).astype(np.float32),
        lidar_images=rng.random((f, 32, 201, 3)).astype(np.float32),
        lidar_ts=np.arange(f) * 100,
        radar_feats=np.tile([10.0, 0.1], (f, 1)).astype(np.float32),
        radar_ts=np.arange(f) * 100 + 50,
    )
    assert data["lidar"].shape[0] == f
    losses = train_fusion(net, data, epochs=4, batch_size=4, lock_camera=True)
    assert losses[-1] < losses[0]

    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        out_csv = os.path.join(d, "fusion.csv")
        predict_fusion(net, data, list(range(f)), out_csv, batch_size=4)
        with open(out_csv) as fh:
            lines = fh.read().strip().splitlines()
        assert len(lines) == f + 1


def test_detector_asset_carries_decode_operating_point():
    """The shipped detector asset ships WITH the decode thresholds it was
    validated at (asset json "decode" dict); tpufusion.benchmarks applies
    them when loading the asset for configs 4/5."""
    import json
    import os

    from tpufusion.benchmarks import _quick_trained_state
    from tpufusion.config import DEFAULT, DecodeConfig

    graphdef, state, dcfg, head = _quick_trained_state()
    assert isinstance(dcfg, DecodeConfig)
    assert head in ("corner", "direct")

    asset_json = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir,
        "tpufusion", "assets", "synthetic_detector.npz.json",
    )
    if os.path.exists(asset_json):
        with open(asset_json) as f:
            meta = json.load(f)
        if "decode" in meta:
            for k, v in meta["decode"].items():
                assert getattr(dcfg, k) == v
        else:
            assert dcfg == DEFAULT.decode


def test_multi_vehicle_and_tracking_sequence_generators():
    import jax
    import numpy as np

    from tpufusion.data.synthetic import (
        synthesize_multi_vehicle_batch,
        synthesize_tracking_sequence,
    )

    pts, gt = synthesize_multi_vehicle_batch(jax.random.PRNGKey(0), 2, 4096, 3)
    assert pts.shape == (2, 4096, 4)
    assert gt["center"].shape == (2, 3, 3)
    c = np.asarray(gt["center"])
    # vehicles angularly separated (clusters never merge in range view)
    for fi in range(2):
        ang = np.arctan2(c[fi, :, 1], c[fi, :, 0])
        d = np.abs((ang[:, None] - ang[None, :] + np.pi) % (2 * np.pi) - np.pi)
        np.fill_diagonal(d, 9)
        assert d.min() > 0.7
    # the last cluster points sit inside their vehicle's box
    m = (4096 // 8) // 3
    cluster = np.asarray(pts[0, -m:, :3])
    assert np.abs(cluster - c[0, 2]).max() <= np.asarray([2.1, 0.8, 0.75]).max()

    seq, sgt = synthesize_tracking_sequence(jax.random.PRNGKey(1), 6, 4096, 2)
    assert seq.shape == (6, 4096, 4)
    sc = np.asarray(sgt["center"])
    # constant-velocity: uniform per-frame displacement, <= 2.83 m/s * dt
    steps = np.linalg.norm(np.diff(sc[:, 0, :2], axis=0), axis=1)
    assert np.allclose(steps, steps[0], atol=1e-5)
    assert steps[0] <= 2.0 * np.sqrt(2.0) * 0.1 + 1e-6


def test_tracker_confirmation_suppresses_flicker():
    """A detection that flickers twice inside the coast window must NOT
    become a confirmed track (n-of-m confirmation — the round-2 config 5
    spurious-track mode); a persistent detection must."""
    from tpufusion.serve.tracker import PoseTracker

    f = 12
    poses = np.zeros((f, 2, 7))
    found = np.zeros((f, 2), bool)
    poses[:, 0, :3] = [15.0, 2.0, -0.7]  # persistent vehicle
    found[:, 0] = True
    poses[:, 1, :3] = [30.0, -5.0, -0.7]  # clutter: fires twice only
    found[2, 1] = found[4, 1] = True

    trails = PoseTracker(dt=0.1).run_multi(poses, found)
    assert len(trails) == 1  # only the persistent track confirms
    (trail,) = trails.values()
    assert len(trail) >= f - 4


def test_tracker_backfills_pre_confirmation_detections():
    """On first confirmation a track's pre-confirmation detections are
    retroactively attached to its trail (coverage at zero spurious
    cost): the persistent vehicle's trail must start at frame 0 and
    cover EVERY frame even though confirmation needs min_hits=3; the
    never-confirmed clutter track must still emit nothing."""
    from tpufusion.serve.tracker import PoseTracker

    f = 10
    poses = np.zeros((f, 2, 7))
    found = np.zeros((f, 2), bool)
    poses[:, 0, :3] = [15.0, 2.0, -0.7]  # persistent vehicle
    found[:, 0] = True
    poses[:, 1, :3] = [30.0, -5.0, -0.7]  # clutter: fires twice only
    found[2, 1] = found[4, 1] = True

    trails = PoseTracker(dt=0.1).run_multi(poses, found)
    assert len(trails) == 1
    (trail,) = trails.values()
    frames = [fr for fr, _ in trail]
    assert frames == list(range(f))  # full coverage incl. frames 0-1
    for _, pose in trail[:2]:  # backfilled entries are the detections
        assert np.allclose(pose[:3], [15.0, 2.0, -0.7], atol=1e-9)


def test_track_quality_metrics_counts_switches_and_spurious():
    from tpufusion.serve.tracker import track_quality_metrics

    f = 10
    gt = np.zeros((f, 1, 3))
    gt[:, 0, 0] = 10.0  # stationary vehicle at x=10
    # track 1 covers frames 0-4, track 7 covers 5-9 (one id switch +
    # one fragmentation), track 9 never near the vehicle (spurious)
    mk = lambda x: np.asarray([x, 0.0, -0.7, 0, 4.2, 1.6, 1.5])
    trails = {
        1: [(i, mk(10.0)) for i in range(5)],
        7: [(i, mk(10.2)) for i in range(5, 10)],
        9: [(i, mk(40.0)) for i in range(10)],
    }
    q = track_quality_metrics(trails, gt)
    assert q["vehicles_tracked"] == 1
    assert q["spurious_tracks"] == 1
    assert q["id_switches"] == 1
    assert q["fragmentation"] == 1
    assert q["coverage"] == 1.0


def test_live_viewer_serves_frames_and_stream():
    """The browser live viewer (serve/viewer.py — the headless stand-in
    for the reference's pyglet windows): index lists pushed windows,
    /frame returns the latest JPEG, /stream yields an MJPEG part."""
    import urllib.request

    import numpy as np

    from tpufusion.serve.viewer import LiveViewer

    with LiveViewer(port=0, host="127.0.0.1") as v:
        v.push("range_view", np.random.default_rng(0).uniform(
            0, 1, (32, 64, 3)))
        base = f"http://127.0.0.1:{v.port}"
        html = urllib.request.urlopen(f"{base}/", timeout=5).read()
        assert b"range_view" in html
        jpg = urllib.request.urlopen(
            f"{base}/frame/range_view", timeout=5).read()
        assert jpg[:2] == b"\xff\xd8"  # JPEG SOI
        r = urllib.request.urlopen(f"{base}/stream/range_view", timeout=5)
        head = r.read(200)
        assert b"--frame" in head and b"image/jpeg" in head
        r.close()
        # unknown window 404s rather than hanging
        import urllib.error

        try:
            urllib.request.urlopen(f"{base}/frame/nope", timeout=5)
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404


def test_view_dataset_replays_raw_npz(tmp_path):
    """cli view on a raw points npz streams range_view + bev windows
    end-to-end (one pass, fast rate, ephemeral port)."""
    import threading
    import urllib.request

    import jax
    import numpy as np

    from tpufusion.data.synthetic import synthesize_points_batch
    from tpufusion.serve import viewer as viewer_mod

    pts, _ = synthesize_points_batch(jax.random.PRNGKey(0), 2, 2048)
    raw = tmp_path / "raw.npz"
    np.savez(raw, points=np.asarray(pts))

    grabbed = {}
    orig_start = viewer_mod.LiveViewer.start

    def start_and_grab(self):
        orig_start(self)
        grabbed["viewer"] = self
        return self

    viewer_mod.LiveViewer.start = start_and_grab
    try:
        t = threading.Thread(
            target=viewer_mod.view_dataset,
            args=(str(raw),),
            kwargs={"port": 0, "rate_hz": 1000.0},
        )
        t.start()
        t.join(timeout=120)
        assert not t.is_alive()
    finally:
        viewer_mod.LiveViewer.start = orig_start
    v = grabbed["viewer"]
    # frames persist after stop? server is down; check the cache directly
    assert {"range_view", "bev"} <= set(v._frames)
    assert v._frames["range_view"][:2] == b"\xff\xd8"


def test_tracker_intermittent_clutter_not_confirmed():
    """Clutter firing every 3rd frame keeps passing min_hits but must
    fail the hit-RATIO gate. Regression: tracks used to age only inside
    the association loop (which breaks early once all detections match
    and never runs on empty frames), so intermittent clutter held
    hits/age ~ 1.0 and confirmed anyway."""
    from tpufusion.serve.tracker import PoseTracker

    f = 12
    poses = np.zeros((f, 2, 7))
    found = np.zeros((f, 2), bool)
    poses[:, 0, :3] = [15.0, 2.0, -0.7]  # persistent vehicle
    found[:, 0] = True
    poses[:, 1, :3] = [30.0, -5.0, -0.7]  # clutter: every 3rd frame
    found[2::3, 1] = True  # frames 2, 5, 8, 11 -> 4 hits, ratio 4/10

    trails = PoseTracker(dt=0.1).run_multi(poses, found)
    assert len(trails) == 1  # only the persistent vehicle confirms
    (trail,) = trails.values()
    assert np.allclose(trail[0][1][:2], [15.0, 2.0], atol=1.0)


def test_mixed_family_eval_best_effort(monkeypatch):
    """Config 4's mixed-family companion row is best-effort: any load
    failure skips the row (returns None) instead of publishing a
    substitute model's scores under the mixed asset's name — the same
    contract as the wide-yaw companion."""
    import os

    import tpufusion.benchmarks as B

    # guard against a vacuous pass: if the shipped asset were absent,
    # _companion_asset_eval would return None BEFORE reaching the
    # monkeypatched loader and the skip-on-load-failure contract would
    # go untested silently
    asset = os.path.join(
        os.path.dirname(os.path.abspath(B.__file__)),
        "assets", "synthetic_detector_mixed.npz",
    )
    assert os.path.exists(asset), "shipped mixed asset missing"

    def boom(*a, **k):
        raise RuntimeError("load failed")

    monkeypatch.setattr(B, "_quick_trained_state", boom)
    assert B._mixed_family_eval() is None


def test_quick_trained_state_no_fallback_raises(tmp_path):
    """fallback=False must raise instead of silently quick-training a
    substitute model (the wide-yaw companion row would otherwise publish
    a fallback model's scores under the asset's name)."""
    import json

    import pytest

    from tpufusion.benchmarks import _quick_trained_state

    with pytest.raises(FileNotFoundError):
        _quick_trained_state(
            asset_path=str(tmp_path / "missing.npz"), fallback=False
        )

    # corrupt npz with a readable json: must raise, not fall back
    bad = tmp_path / "bad.npz"
    bad.write_bytes(b"not an npz")
    (tmp_path / "bad.npz.json").write_text(json.dumps(
        {"decode": {}, "model": {"head": "direct"}}
    ))
    with pytest.raises(Exception):
        _quick_trained_state(asset_path=str(bad), fallback=False)


def test_surface_fit_params_single_source():
    """The scene-family -> fit-boundary mapping is shared by the trainer,
    the asset-json writer, and the tuner (data/synthetic.py is the single
    source of truth for the ray-cast surface insets)."""
    from tpufusion.data.synthetic import surface_fit_params
    from tpufusion.config import DEFAULT
    from tpufusion.tools.train_synthetic_detector import deployment_decode

    assert surface_fit_params("beam-ellipse") == ("ellipse", 0.9)
    assert surface_fit_params("beam") == ("circle", 0.8)
    assert surface_fit_params("uniform") == ("circle", 0.8)
    d = deployment_decode(DEFAULT.decode, 0.8, 8.0, scenes="beam-ellipse")
    assert (d.fit_boundary, d.fit_surface_scale) == ("ellipse", 0.9)
    d = deployment_decode(DEFAULT.decode, 0.8, 8.0, scenes="beam")
    assert (d.fit_boundary, d.fit_surface_scale) == ("circle", 0.8)


def test_decode_for_resolution_overrides():
    """decode_for_resolution picks the NEAREST calibrated resolution's
    overrides and leaves the config untouched without a table."""
    import dataclasses

    from tpufusion.benchmarks import decode_for_resolution
    from tpufusion.config import DecodeConfig

    base = DecodeConfig(min_prob=0.8, min_bbox_area=8.0)
    meta = {"decode_per_resolution": {
        "16384": {"min_prob": 0.3},
        "32768": {"min_prob": 0.8},
        "65536": {"min_prob": 0.9, "min_bbox_area": 20.0},
    }}
    assert decode_for_resolution(base, meta, 16384).min_prob == 0.3
    assert decode_for_resolution(base, meta, 20000).min_prob == 0.3
    assert decode_for_resolution(base, meta, 32768).min_prob == 0.8
    got = decode_for_resolution(base, meta, 100_000)
    assert got.min_prob == 0.9 and got.min_bbox_area == 20.0
    # overrides touch only the listed fields
    assert got.direct_center == base.direct_center
    # no table / no meta -> unchanged object
    assert decode_for_resolution(base, {}, 16384) is base
    assert decode_for_resolution(base, None, 16384) is base
    assert decode_for_resolution(
        base, {"decode_per_resolution": {}}, 16384
    ) is base
