from tpufusion.eval.tracklet_xml import Tracklet, TrackletCollection, parse_tracklet_xml
from tpufusion.eval.interpolate import interpolate_poses, load_timestamps_csv
from tpufusion.eval.scoring import (
    box_iou_3d,
    orbit_to_physical,
    physical_to_orbit,
    pose_errors,
    score_poses,
)
from tpufusion.eval.submission import generate_submission

__all__ = [
    "Tracklet",
    "TrackletCollection",
    "parse_tracklet_xml",
    "interpolate_poses",
    "load_timestamps_csv",
    "pose_errors",
    "box_iou_3d",
    "orbit_to_physical",
    "physical_to_orbit",
    "score_poses",
    "generate_submission",
]
