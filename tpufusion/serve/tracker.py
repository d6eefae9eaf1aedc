"""Multi-frame temporal tracking over per-frame pose detections.

BASELINE config 5 asks for multi-frame temporal tracking at Waymo scale.
The reference has no tracker — it patches gaps by timestamp interpolation
after the fact (`generate_tracklet_predictions.py:47-63`). Here a light
host-side constant-velocity tracker runs over the per-frame device
detections: gating by distance, exponential smoothing of pose and size,
coasting through missed frames, and track retirement. Per-frame cost is a
few scalar ops — it never touches the device hot path.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Track:
    track_id: int
    pose: np.ndarray  # (7,) tx ty tz rz l w h
    velocity: np.ndarray  # (3,)
    last_seen: int
    hits: int = 1
    age: int = 1

    @property
    def confirmed(self) -> bool:
        return self.hits >= 2


class PoseTracker:
    def __init__(
        self,
        gate_m: float = 5.0,
        smooth: float = 0.5,
        max_coast: int = 5,
        dt: float = 0.1,
    ):
        self.gate_m = gate_m
        self.smooth = smooth
        self.max_coast = max_coast
        self.dt = dt
        self.tracks: list[Track] = []
        self._next_id = 1
        self._frame = 0

    def _predict(self, t: Track) -> np.ndarray:
        p = t.pose.copy()
        p[:3] += t.velocity * self.dt * (self._frame - t.last_seen)
        return p

    def step(self, detections: np.ndarray, found: np.ndarray) -> list[Track]:
        """detections (K, 7) poses for one frame (K=1 for this pipeline);
        found (K,) validity. Returns live confirmed tracks."""
        self._frame += 1
        dets = [d for d, ok in zip(np.atleast_2d(detections), found) if ok]
        unmatched = list(range(len(dets)))

        # greedy nearest association, gated
        for t in sorted(self.tracks, key=lambda t: -t.hits):
            if not unmatched:
                break
            pred = self._predict(t)
            dists = [
                np.linalg.norm(dets[i][:3] - pred[:3]) for i in unmatched
            ]
            j = int(np.argmin(dists))
            if dists[j] <= self.gate_m:
                i = unmatched.pop(j)
                det = np.asarray(dets[i], np.float64)
                gap = max(self._frame - t.last_seen, 1)
                new_v = (det[:3] - t.pose[:3]) / (self.dt * gap)
                t.velocity = self.smooth * t.velocity + (1 - self.smooth) * new_v
                t.pose = self.smooth * t.pose + (1 - self.smooth) * det
                t.last_seen = self._frame
                t.hits += 1
            t.age += 1

        for i in unmatched:
            self.tracks.append(
                Track(
                    track_id=self._next_id,
                    pose=np.asarray(dets[i], np.float64),
                    velocity=np.zeros(3),
                    last_seen=self._frame,
                )
            )
            self._next_id += 1

        self.tracks = [
            t
            for t in self.tracks
            if self._frame - t.last_seen <= self.max_coast
        ]
        return [t for t in self.tracks if t.confirmed]

    def run_multi(
        self, poses: np.ndarray, founds: np.ndarray
    ) -> dict[int, list[tuple[int, np.ndarray]]]:
        """Online tracking over a multi-detection sequence: poses (F, K, 7),
        founds (F, K) -> {track_id: [(frame, pose), ...]} for every track
        that was ever confirmed."""
        trails: dict[int, list[tuple[int, np.ndarray]]] = {}
        for f in range(len(poses)):
            for t in self.step(poses[f], np.asarray(founds[f])):
                trails.setdefault(t.track_id, []).append(
                    (f, self._predict(t))
                )
        return trails

    def run(self, poses: np.ndarray, founds: np.ndarray) -> np.ndarray:
        """Offline smoothing over a sequence: (F, 7), (F,) -> (F, 7) poses
        of the dominant track (coasted through misses; zeros before the
        first confirmation)."""
        out = np.zeros_like(np.asarray(poses, np.float64))
        for f in range(len(poses)):
            live = self.step(poses[f][None], np.asarray([founds[f]]))
            if live:
                best = max(live, key=lambda t: t.hits)
                out[f] = self._predict(best)
        return out
