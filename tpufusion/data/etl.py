"""Offline extraction (ETL): raw frames -> training-ready dataset dirs.

Rebuilds the reference ETL driver (`modules/lidar/process/extract_rosbag.py`)
without ROS: the input is per-frame point-cloud arrays (from any upstream
reader — NPZ dumps, a rosbag converted offline, a Waymo segment), and the
outputs are the same logical artifacts the reference wrote per bag
(`extract_rosbag.py:52-60,314-347`):

    lidar_frames.npz                 range-view tensors (device-projected,
                                     batched — the per-frame NumPy loops of
                                     extract_rosbag_lidar.py are gone)
    bev_frames.npz                   BEV rasters (optional)
    lidar_timestamps.csv / camera_timestamps.csv
    radar/radar_tracks.csv
    obs_poses_interp_transform.csv   GT interpolated onto lidar timestamps
    obs_poses_camera.csv             GT interpolated onto camera timestamps

plus the per-topic max-gap report (`extract_rosbag.py:302-307`). Duplicate
timestamps are dropped like the reference's dedup (`:316-321`).
"""

from __future__ import annotations

import csv
import os

import jax
import numpy as np

from tpufusion.config import BevSpec, RangeViewSpec
from tpufusion.eval.interpolate import interpolate_poses
from tpufusion.eval.tracklet_xml import flatten_tracklets, parse_tracklet_xml
from tpufusion.geometry.bev import bev_rasterize_batch
from tpufusion.geometry.range_view import range_view_project_batch
from tpufusion.utils.logging import get_logger

log = get_logger("etl")


def _dedup(timestamps: np.ndarray) -> np.ndarray:
    """Indices of first occurrences, order preserved."""
    _, idx = np.unique(np.asarray(timestamps, np.int64), return_index=True)
    return np.sort(idx)


def _write_ts_csv(path: str, timestamps) -> None:
    with open(path, "w", newline="") as f:
        wr = csv.writer(f)
        wr.writerow(["timestamp"])
        for t in timestamps:
            wr.writerow([int(t)])


def _write_pose_csv(path: str, rows) -> None:
    with open(path, "w", newline="") as f:
        wr = csv.DictWriter(
            f, ["timestamp", "tx", "ty", "tz", "rx", "ry", "rz"]
        )
        wr.writeheader()
        for r in rows:
            wr.writerow({k: r[k] for k in wr.fieldnames})


def max_gap_report(streams: dict[str, np.ndarray]) -> dict[str, float]:
    """Per-stream max inter-message gap in seconds (`extract_rosbag.py:
    302-307`)."""
    out = {}
    for name, ts in streams.items():
        ts = np.sort(np.asarray(ts, np.int64))
        out[name] = float(np.diff(ts).max() / 1e9) if len(ts) > 1 else 0.0
    return out


def extract_dataset(
    out_dir: str,
    lidar_points: np.ndarray,  # (F, N, 4) padded clouds (NaN padding ok)
    lidar_timestamps: np.ndarray,  # (F,) ns
    tracklet_xml: str | None = None,  # ground-truth tracklet file
    camera_timestamps: np.ndarray | None = None,
    radar_rows: list[dict] | None = None,
    spec: RangeViewSpec = RangeViewSpec(),
    bev: BevSpec | None = None,
    batch: int = 32,
) -> dict:
    os.makedirs(out_dir, exist_ok=True)

    keep = _dedup(lidar_timestamps)
    if len(keep) != len(lidar_timestamps):
        log.info("dropped %d duplicate lidar timestamps",
                 len(lidar_timestamps) - len(keep))
    lidar_points = lidar_points[keep]
    lidar_timestamps = np.asarray(lidar_timestamps, np.int64)[keep]

    # device-projected tensors, in batches
    frames, bevs = [], []
    for lo in range(0, len(lidar_points), batch):
        chunk = jax.numpy.asarray(lidar_points[lo : lo + batch])
        frames.append(np.asarray(range_view_project_batch(chunk, spec)))
        if bev is not None:
            bevs.append(np.asarray(bev_rasterize_batch(chunk, bev)))
    images = np.concatenate(frames) if frames else np.zeros((0,))
    np.savez_compressed(
        os.path.join(out_dir, "lidar_frames.npz"),
        images=images,
        timestamps=lidar_timestamps,
    )
    if bev is not None:
        np.savez_compressed(
            os.path.join(out_dir, "bev_frames.npz"),
            images=np.concatenate(bevs),
            timestamps=lidar_timestamps,
        )

    _write_ts_csv(os.path.join(out_dir, "lidar_timestamps.csv"), lidar_timestamps)
    if camera_timestamps is not None:
        camera_timestamps = np.asarray(camera_timestamps, np.int64)
        camera_timestamps = camera_timestamps[_dedup(camera_timestamps)]
        _write_ts_csv(
            os.path.join(out_dir, "camera_timestamps.csv"), camera_timestamps
        )

    if radar_rows:
        os.makedirs(os.path.join(out_dir, "radar"), exist_ok=True)
        with open(
            os.path.join(out_dir, "radar", "radar_tracks.csv"), "w", newline=""
        ) as f:
            wr = csv.DictWriter(f, list(radar_rows[0].keys()))
            wr.writeheader()
            wr.writerows(radar_rows)

    gt = {}
    if tracklet_xml is not None and camera_timestamps is not None:
        tracklets = parse_tracklet_xml(tracklet_xml)
        source = flatten_tracklets(tracklets, list(map(int, camera_timestamps)))
        source = [r for r in source if "timestamp" in r]
        lidar_gt = interpolate_poses(source, list(map(int, lidar_timestamps)))
        cam_gt = interpolate_poses(source, list(map(int, camera_timestamps)))
        _write_pose_csv(
            os.path.join(out_dir, "obs_poses_interp_transform.csv"), lidar_gt
        )
        _write_pose_csv(os.path.join(out_dir, "obs_poses_camera.csv"), cam_gt)
        gt = {"lidar_gt": len(lidar_gt), "camera_gt": len(cam_gt)}

    streams = {"lidar": lidar_timestamps}
    if camera_timestamps is not None:
        streams["camera"] = camera_timestamps
    report = {"frames": int(len(lidar_timestamps)), "max_gap_s": max_gap_report(streams)}
    report.update(gt)
    log.info("extracted %s: %s", out_dir, report)
    return report


def load_extracted(out_dir: str) -> dict[str, np.ndarray]:
    data = np.load(os.path.join(out_dir, "lidar_frames.npz"))
    return {"images": data["images"], "timestamps": data["timestamps"]}
