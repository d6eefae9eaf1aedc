"""Radar track handling.

Covers `modules/lidar/process/radar_tracks.py` (track-message fields) and
`modules/lidar/process/process_radar_data.py:98-115` (polar track ->
lidar-frame 3D point with the radar mount offset): the radar sits
3.8 m ahead of the lidar origin and 1.5494 m below it in the reference's
rig (the `3.8 - 1.5494` constants).
"""

from __future__ import annotations

import csv
import dataclasses

import numpy as np

RADAR_FIELDS = (
    "status", "number", "range", "rate", "accel", "angle",
    "width", "late_rate", "moving", "power", "absolute_rate",
)

# reference rig offsets (process_radar_data.py:98,108)
RADAR_FORWARD_OFFSET = 3.8
RADAR_HEIGHT_OFFSET = -1.5494


@dataclasses.dataclass
class RadarTrack:
    timestamp: int
    range: float
    angle: float  # degrees in the reference data
    rate: float = 0.0
    status: float = 0.0

    def to_xyz(self) -> np.ndarray:
        """Polar -> lidar-frame cartesian with mount offsets."""
        a = np.deg2rad(self.angle)
        x = self.range * np.cos(a) + RADAR_FORWARD_OFFSET
        y = -self.range * np.sin(a)
        return np.asarray([x, y, RADAR_HEIGHT_OFFSET], np.float64)


def load_radar_csv(path: str) -> list[RadarTrack]:
    out = []
    with open(path) as f:
        for row in csv.DictReader(f):
            out.append(
                RadarTrack(
                    timestamp=int(float(row["timestamp"])),
                    range=float(row["range"]),
                    angle=float(row["angle"]),
                    rate=float(row.get("rate", 0.0)),
                    status=float(row.get("status", 0.0)),
                )
            )
    return out


def radar_features(tracks: list[RadarTrack]) -> np.ndarray:
    """(T, 2) [range, angle] — the fusion net's radar input
    (train_fcn.py:279)."""
    return np.asarray([[t.range, t.angle] for t in tracks], np.float32)


def radar_timestamps(tracks: list[RadarTrack]) -> np.ndarray:
    return np.asarray([t.timestamp for t in tracks], np.int64)
