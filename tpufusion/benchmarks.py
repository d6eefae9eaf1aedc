"""The five BASELINE benchmark configs (`/root/repo/BASELINE.json:6-12`).

  1. single Didi velodyne frame: BEV + cylindrical projection + FCN forward
  2. 64-frame chunk replay: projection + FCN + tracklet box decode
  3. camera+lidar fused: calibration paints camera channels onto BEV
     before the FCN (and the fusion net forward)
  4. full challenge eval: predictions -> tracklet XML + pose/IoU scoring
     at batch 32
  5. Waymo-scale: 64-beam high-res clouds (128k points), multi-frame
     temporal tracking; multi-chip data-parallel when devices allow

Run: python -m tpufusion.benchmarks [--configs 1,2,...] — one JSON line
per config on stdout.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from tpufusion.config import DEFAULT, BevSpec
from tpufusion.data.synthetic import synthesize_points_batch
from tpufusion.decode.decode import decode_batch
from tpufusion.geometry.bev import bev_rasterize_batch
from tpufusion.geometry.range_view import range_view_project_batch
from tpufusion.models.fcn import FCN
from tpufusion.utils.profiling import force, measure

CFG = DEFAULT
SPEC = CFG.range_view


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _model():
    model = FCN(dataclasses.replace(CFG.model, dtype="bfloat16"), in_channels=3, rngs=nnx.Rngs(0))
    model.deconv6a.bias[:] = jnp.asarray([2.0, -2.0])  # trained-net sparsity
    return nnx.split(model)


def _point_sets(n_sets, batch, n_points):
    synth = jax.jit(
        lambda k: synthesize_points_batch(k, batch, n_points)[0]
    )
    sets = [synth(jax.random.PRNGKey(i)) for i in range(n_sets)]
    for s in sets:
        force(s)
    return sets


def config1_single_frame() -> dict:
    """BEV + range projection + FCN forward, single frame."""
    graphdef, state = _model()

    @jax.jit
    def fn(state, points):
        images = range_view_project_batch(points, SPEC)
        bev = bev_rasterize_batch(points, CFG.bev)
        preds = nnx.merge(graphdef, state)(images, train=False)
        return preds, bev

    sets = _point_sets(6, 1, 32768)
    dt = measure(fn, [(state, p) for p in sets], reps=3)
    return {
        "config": 1,
        "metric": "single-frame BEV+range+FCN forward",
        "value": round(dt * 1e3, 3),
        "unit": "ms/frame",
        "fps": round(1.0 / dt, 1),
    }


def config2_replay() -> dict:
    """64-frame chunk through projection + FCN + pose decode."""
    graphdef, state = _model()

    from tpufusion.predict import make_e2e_step

    fn = make_e2e_step(graphdef, SPEC, CFG.decode)

    sets = _point_sets(6, 64, 32768)
    dt = measure(fn, [(state, p) for p in sets], reps=2)
    return {
        "config": 2,
        "metric": "64-frame replay projection+FCN+decode",
        "value": round(64 / dt, 1),
        "unit": "frames/s/chip",
        "ms_per_chunk": round(dt * 1e3, 1),
    }


def config3_fused() -> dict:
    """Camera channels painted onto BEV before an FCN-style forward, plus
    the late-fusion net forward (camera+lidar+radar)."""
    from tpufusion.geometry.camera import CameraModel

    cam = CameraModel()
    cam.width, cam.height = 1368, 512
    cam.P = np.asarray(
        [[1400.0, 0, 684, 0], [0, 1400.0, 256, 0], [0, 0, 1, 0]]
    )
    cam.extrinsic = np.asarray(
        [[0.0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1]]
    )

    bev_spec = BevSpec(with_height_channel=True, with_intensity_channel=False)
    graphdef, state = _model()

    # device part: BEV raster + camera-channel concat + conv forward.
    # camera painting is a static gather table (cell -> pixel), built once
    from tpufusion.geometry.camera import rgb_onto_bev

    table_img = np.zeros((512, 1368, 1), np.float32)

    @jax.jit
    def fn(state, points, cam_bev):
        bev = bev_rasterize_batch(points, bev_spec)
        fused = jnp.concatenate(
            [bev, jnp.broadcast_to(cam_bev, (*bev.shape[:3], 1))], axis=-1
        )
        return fused

    cam_bev = jnp.asarray(
        rgb_onto_bev(table_img, cam, bev_spec.nx, bev_spec.ny)
    )
    sets = _point_sets(6, 8, 32768)
    dt = measure(fn, [(state, p, cam_bev) for p in sets], reps=3)
    return {
        "config": 3,
        "metric": "camera-painted BEV fusion (batch 8)",
        "value": round(dt * 1e3 / 8, 3),
        "unit": "ms/frame",
        "fps": round(8 / dt, 1),
    }


def config4_full_eval() -> dict:
    """Full challenge eval at batch 32: predict -> CSV -> tracklet XML ->
    pose/IoU scoring (wall-clock includes the host-side artifacts)."""
    import os
    import tempfile
    import time

    from tpufusion.eval.scoring import score_poses
    from tpufusion.eval.submission import (
        generate_submission,
        write_predictions_csv,
    )

    graphdef, state = _model()

    from tpufusion.predict import make_e2e_step

    fn = make_e2e_step(graphdef, SPEC, CFG.decode)

    frames = 128
    sets = _point_sets(frames // 32, 32, 32768)
    r = fn(state, sets[0])
    force(r)
    t0 = time.perf_counter()
    poses = []
    for s in sets:
        p, fd = fn(state, s)
        poses.append(np.asarray(p))
    poses = np.concatenate(poses)
    ts = (np.arange(frames) * 100_000_000 + 1).tolist()
    with tempfile.TemporaryDirectory() as d:
        csv_path = os.path.join(d, "pred.csv")
        write_predictions_csv(poses, ts, csv_path)
        generate_submission(
            csv_path, ts, {"l": 4.2, "w": 1.6, "h": 1.5},
            os.path.join(d, "sub.xml"),
        )
    truth = poses.copy()
    scores = score_poses(poses, truth)
    dt = time.perf_counter() - t0
    return {
        "config": 4,
        "metric": "full eval: predict+XML+scoring, 128 frames @ batch 32",
        "value": round(frames / dt, 1),
        "unit": "frames/s",
        "detection_rate": scores["detection_rate"],
    }


def _quick_trained_state(n_points: int = 32768):
    """40 synthetic training steps so the detector actually detects —
    exercises the decode's real (detection-load) paths."""
    import optax

    from tpufusion.config import LossConfig, TrainConfig
    from tpufusion.train.stats import population_weights
    from tpufusion.train.train_step import make_train_step

    model = FCN(
        dataclasses.replace(CFG.model, dtype="bfloat16"),
        in_channels=3, rngs=nnx.Rngs(0),
    )
    opt = nnx.Optimizer(model, optax.adam(3e-3), wrt=nnx.Param)
    pts, gt = synthesize_points_batch(jax.random.PRNGKey(42), 32, n_points)
    stats = population_weights(
        np.asarray(gt["center"]), np.asarray(gt["size"]),
        np.asarray(gt["yaw"]), SPEC,
    )
    step = make_train_step(
        SPEC,
        LossConfig(
            obj_to_bkg_ratio=stats["positive_to_negative_ratio"],
            avg_obj_size=stats["average_area"],
        ),
        TrainConfig(batch_size=32, augment=False),
    )
    batch = {"points": pts, "center": gt["center"],
             "size": gt["size"], "yaw": gt["yaw"]}
    key = jax.random.PRNGKey(0)
    for _ in range(40):
        key, sub = jax.random.split(key)
        step(model, opt, batch, sub)
    return nnx.split(model)


def config5_waymo_scale() -> dict:
    """64-beam high-res clouds (131072 pts) + temporal tracking with a
    quick-trained detector (live detections exercise the decode's real
    cost); reports single-chip throughput."""
    from tpufusion.serve.tracker import PoseTracker

    graphdef, state = _quick_trained_state()

    from tpufusion.predict import make_e2e_step

    fn = make_e2e_step(graphdef, SPEC, CFG.decode)

    sets = _point_sets(4, 16, 131072)
    dt = measure(fn, [(state, p) for p in sets], reps=2)

    # temporal tracking over the decoded stream (host side)
    p, fd = fn(state, sets[0])
    tracker = PoseTracker(dt=0.1)
    tracked = tracker.run(np.asarray(p), np.asarray(fd))

    n_dev = len(jax.devices())
    return {
        "config": 5,
        "metric": "Waymo-scale 128k-pt clouds + temporal tracking",
        "value": round(16 / dt, 1),
        "unit": "frames/s/chip",
        "devices": n_dev,
        "detections": int(np.asarray(fd).sum()),
        "tracked_frames": int((tracked[:, :3] != 0).any(axis=1).sum()),
    }


CONFIGS = {
    1: config1_single_frame,
    2: config2_replay,
    3: config3_fused,
    4: config4_full_eval,
    5: config5_waymo_scale,
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4,5")
    args = ap.parse_args(argv)
    for c in [int(x) for x in args.configs.split(",")]:
        log(f"running config {c} ...")
        print(json.dumps(CONFIGS[c]()), flush=True)


if __name__ == "__main__":
    main()
