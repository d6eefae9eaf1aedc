"""Tracklet XML byte format, interpolation, scoring, submission flow."""

import numpy as np

from tpufusion.eval.tracklet_xml import (
    Tracklet,
    TrackletCollection,
    parse_tracklet_xml,
    flatten_tracklets,
)
from tpufusion.eval.interpolate import interpolate_poses
from tpufusion.eval.scoring import box_iou_3d, score_poses
from tpufusion.eval.submission import generate_submission, write_predictions_csv

# byte-exact golden of the reference emitter's format
# (modules/lidar/common/tracklet_generator.py) for one tracklet, two poses
GOLDEN = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes" ?>\n'
    "<!DOCTYPE boost_serialization>\n"
    '<boost_serialization signature="serialization::archive" version="9">\n'
    '<tracklets class_id="0" tracking_level="0" version="0">\n'
    "\t<count>1</count>\n"
    "\t<item_version>1</item_version> \n"
    '\t<item class_id="1" tracking_level="0" version="1">\n'
    "\t\t<objectType>Car</objectType>\n"
    "\t\t<h>1.500000</h>\n"
    "\t\t<w>1.600000</w>\n"
    "\t\t<l>4.200000</l>\n"
    "\t\t<first_frame>0</first_frame>\n"
    '\t\t<poses class_id="2" tracking_level="0" version="0">\n'
    "\t\t\t<count>2</count>\n"
    "\t\t\t<item_version>2</item_version>\n"
    '\t\t\t<item class_id="3" tracking_level="0" version="2">\n'
    "\t\t\t\t<tx>1.000000</tx>\n"
    "\t\t\t\t<ty>2.000000</ty>\n"
    "\t\t\t\t<tz>-0.500000</tz>\n"
    "\t\t\t\t<rx>0.000000</rx>\n"
    "\t\t\t\t<ry>0.000000</ry>\n"
    "\t\t\t\t<rz>0.300000</rz>\n"
    "\t\t\t\t<state>1</state>\n"
    "\t\t\t\t<occlusion>-1</occlusion>\n"
    "\t\t\t\t<occlusion_kf>-1</occlusion_kf>\n"
    "\t\t\t\t<truncation>-1</truncation>\n"
    "\t\t\t\t<amt_occlusion>0.0</amt_occlusion>\n"
    "\t\t\t\t<amt_occlusion_kf>-1</amt_occlusion_kf>\n"
    "\t\t\t\t<amt_border_l>0.0</amt_border_l>\n"
    "\t\t\t\t<amt_border_r>0.0</amt_border_r>\n"
    "\t\t\t\t<amt_border_kf>-1</amt_border_kf>\n"
    "\t\t\t</item>\n"
    "\t\t\t<item>\n"
    "\t\t\t\t<tx>1.100000</tx>\n"
    "\t\t\t\t<ty>2.100000</ty>\n"
    "\t\t\t\t<tz>-0.400000</tz>\n"
    "\t\t\t\t<rx>0.000000</rx>\n"
    "\t\t\t\t<ry>0.000000</ry>\n"
    "\t\t\t\t<rz>0.310000</rz>\n"
    "\t\t\t\t<state>1</state>\n"
    "\t\t\t\t<occlusion>-1</occlusion>\n"
    "\t\t\t\t<occlusion_kf>-1</occlusion_kf>\n"
    "\t\t\t\t<truncation>-1</truncation>\n"
    "\t\t\t\t<amt_occlusion>0.0</amt_occlusion>\n"
    "\t\t\t\t<amt_occlusion_kf>-1</amt_occlusion_kf>\n"
    "\t\t\t\t<amt_border_l>0.0</amt_border_l>\n"
    "\t\t\t\t<amt_border_r>0.0</amt_border_r>\n"
    "\t\t\t\t<amt_border_kf>-1</amt_border_kf>\n"
    "\t\t\t</item>\n"
    "\t\t</poses>\n"
    "\t\t<finished>1</finished>\n"
    "\t</item>\n"
    "</tracklets>\n"
    "</boost_serialization> \n"
)


def _demo_collection():
    t = Tracklet("Car", l=4.2, w=1.6, h=1.5, first_frame=0)
    t.poses.append({"tx": 1.0, "ty": 2.0, "tz": -0.5, "rx": 0, "ry": 0, "rz": 0.3})
    t.poses.append({"tx": 1.1, "ty": 2.1, "tz": -0.4, "rx": 0, "ry": 0, "rz": 0.31})
    return TrackletCollection(tracklets=[t])


def test_tracklet_xml_bytes(tmp_path):
    path = tmp_path / "t.xml"
    _demo_collection().write_xml(str(path))
    assert path.read_text() == GOLDEN


def test_tracklet_parse_roundtrip(tmp_path):
    path = tmp_path / "t.xml"
    _demo_collection().write_xml(str(path))
    parsed = parse_tracklet_xml(str(path))
    assert len(parsed) == 1
    assert parsed[0].l == 4.2 and len(parsed[0].poses) == 2
    assert parsed[0].poses[1]["tx"] == 1.1
    rows = flatten_tracklets(parsed, timestamps=[100, 200, 300])
    assert rows[0]["timestamp"] == 100 and rows[1]["timestamp"] == 200


def test_interpolation_matches_scipy():
    src = [
        {"timestamp": 0, "tx": 0.0, "ty": 10.0, "tz": 1.0, "rz": 0.0},
        {"timestamp": 10, "tx": 1.0, "ty": 20.0, "tz": 2.0, "rz": 1.0},
    ]
    out = interpolate_poses(src, [5, 15, -5])
    assert np.isclose(out[0]["tx"], 0.5) and np.isclose(out[0]["ty"], 15.0)
    # linear extrapolation beyond both ends
    assert np.isclose(out[1]["tx"], 1.5) and np.isclose(out[2]["tx"], -0.5)


def test_iou_identical_and_disjoint():
    a = (5.0, 3.0, -0.5, 0.3, 4.0, 1.6, 1.5)
    assert abs(box_iou_3d(a, a) - 1.0) < 1e-6
    b = (50.0, 3.0, -0.5, 0.3, 4.0, 1.6, 1.5)
    assert box_iou_3d(a, b) == 0.0


def test_iou_half_overlap():
    # same box shifted by half its length along x, yaw 0:
    # intersection = l/2 * w * h, union = 1.5*l*w*h -> IoU = 1/3
    a = (0.0, 0.0, 0.0, 0.0, 4.0, 2.0, 2.0)
    b = (2.0, 0.0, 0.0, 0.0, 4.0, 2.0, 2.0)
    assert abs(box_iou_3d(a, b) - 1.0 / 3.0) < 1e-6


def test_score_poses():
    truths = np.tile(np.array([5.0, 3.0, -0.5, 0.3, 4.0, 1.6, 1.5]), (4, 1))
    preds = truths.copy()
    preds[1, 0] += 0.5  # slightly off
    preds[2] = 0.0  # miss
    s = score_poses(preds, truths)
    assert s["detection_rate"] == 0.75
    assert s["recall@iou0.5"] >= 0.5
    assert s["mean_trans_err"] < 0.2


def test_submission_flow(tmp_path):
    pred_csv = tmp_path / "pred.csv"
    poses = [
        (5.0, 3.0, -0.5, 0.3, 4.0, 1.6, 1.5),
        (5.5, 3.2, -0.5, 0.31, 4.0, 1.6, 1.5),
    ]
    write_predictions_csv(poses, [1000, 3000], str(pred_csv))
    out_xml = tmp_path / "sub.xml"
    coll = generate_submission(
        str(pred_csv),
        [1000, 2000, 3000, 4000],
        {"l": 4.0, "w": 1.6, "h": 1.5},
        str(out_xml),
    )
    assert len(coll.tracklets[0].poses) == 4
    # interpolated middle frame
    assert abs(coll.tracklets[0].poses[1]["tx"] - 5.25) < 1e-6
    parsed = parse_tracklet_xml(str(out_xml))
    assert len(parsed[0].poses) == 4


def test_score_multi_poses_matching_and_false_positives():
    """Greedy per-frame matching: each vehicle takes its nearest decoded
    box within the gate; leftovers count as false positives."""
    from tpufusion.eval.scoring import score_multi_poses

    f, k, v = 3, 4, 2
    gt_c = np.zeros((f, v, 3))
    gt_c[:, 0] = [10.0, 0.0, -0.7]
    gt_c[:, 1] = [20.0, 5.0, -0.7]
    gt_y = np.zeros((f, v))
    gt_s = np.broadcast_to([4.2, 1.6, 1.5], (f, v, 3)).copy()

    poses = np.zeros((f, k, 7))
    found = np.zeros((f, k), bool)
    # box 0 sits exactly on vehicle 0; box 1 near vehicle 1 (0.5 m off);
    # box 2 is clutter far from both -> false positive; box 3 not found
    for fr in range(f):
        poses[fr, 0] = [10.0, 0.0, -0.7, 0.0, 4.2, 1.6, 1.5]
        poses[fr, 1] = [20.5, 5.0, -0.7, 0.0, 4.2, 1.6, 1.5]
        poses[fr, 2] = [50.0, -20.0, -0.7, 0.0, 4.2, 1.6, 1.5]
        found[fr, :3] = True

    s = score_multi_poses(poses, found, gt_c, gt_y, gt_s)
    assert s["box_recall"] == 1.0  # both vehicles matched every frame
    assert s["false_positives"] == f  # the clutter box, every frame
    assert s["box_mean_iou"] > 0.4  # exact + 0.5m-offset matches
    assert 0.2 < s["box_xy_err"] < 0.3  # mean of 0 and 0.5

    # vehicle with no box inside the gate is a miss, not a bad match
    found[:, 1] = False
    s2 = score_multi_poses(poses, found, gt_c, gt_y, gt_s)
    assert s2["box_recall"] == 0.5


def test_orbit_physical_round_trip():
    from tpufusion.eval.scoring import orbit_to_physical, physical_to_orbit

    rng = np.random.default_rng(0)
    poses = rng.normal(size=(16, 7))
    back = physical_to_orbit(orbit_to_physical(poses))
    np.testing.assert_allclose(back, poses, atol=1e-12)
    # the all-zero no-detection sentinel survives both directions
    z = np.zeros((2, 7))
    assert np.all(orbit_to_physical(z) == 0) and np.all(
        physical_to_orbit(z) == 0
    )


def test_orbit_scoring_removes_yaw_position_contamination():
    """A prediction whose PHYSICAL center is exact but whose yaw is 0.1 rad
    off must score ~0 xy error under pose_frame="orbit"; interpreting the
    same orbit tuples as physical manufactures ~range*yaw_err of fake
    translation error (the decode pipeline emits orbit tuples — see
    eval/scoring module docstring)."""
    from tpufusion.eval.scoring import physical_to_orbit, score_poses

    phys_gt = np.array([[20.0, 0.0, -0.5, 0.4, 4.2, 1.6, 1.5]])
    phys_pred = phys_gt.copy()
    phys_pred[0, 3] = 0.5  # pure yaw error
    orb_gt, orb_pred = physical_to_orbit(phys_gt), physical_to_orbit(phys_pred)

    s = score_poses(orb_pred, orb_gt, pose_frame="orbit")
    assert s["mean_xy_err"] < 1e-9
    assert abs(s["mean_yaw_err"] - 0.1) < 1e-9
    assert s["mean_iou"] > 0.5  # boxes really overlap that much

    naive = score_poses(orb_pred, orb_gt)  # orbit tuples scored as-is
    assert naive["mean_xy_err"] > 1.5  # ~ 20 m * 0.1 rad


def test_score_multi_poses_orbit_frame():
    from tpufusion.eval.scoring import physical_to_orbit, score_multi_poses

    # one frame, one vehicle at physical (18, 6) yaw 0.6; the decoded box
    # is physically 0.3 m off — in orbit coordinates both tuples sit far
    # from their physical locations, so matching must happen post-rotation
    yaw = 0.6
    phys = np.array([[[18.0, 6.0, -0.6, yaw, 4.2, 1.6, 1.5]]])
    pred_phys = phys.copy()
    pred_phys[0, 0, 0] += 0.3
    pred_orb = physical_to_orbit(pred_phys)
    c, s_ = np.cos(-yaw), np.sin(-yaw)
    gt_c_orb = np.array([[[c * 18.0 - s_ * 6.0, s_ * 18.0 + c * 6.0, -0.6]]])

    s = score_multi_poses(
        pred_orb, np.ones((1, 1), bool), gt_c_orb,
        np.array([[yaw]]), phys[..., 4:7], pose_frame="orbit",
    )
    assert s["box_recall"] == 1.0
    assert abs(s["box_xy_err"] - 0.3) < 1e-6
    assert s["box_mean_iou"] > 0.5
