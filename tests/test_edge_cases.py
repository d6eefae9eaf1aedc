"""Reference-fidelity edge cases: azimuth wrap, empty clouds, augmentation
validity, multi-blob selection ordering."""

import numpy as np
import jax
import jax.numpy as jnp

from tpufusion.config import DecodeConfig, RangeViewSpec
from tpufusion.data.augment import sample_roll
from tpufusion.decode import decode_frame
from tpufusion.geometry.range_view import range_view_project
from tpufusion.geometry import boxes, encoding

from tests.conftest import synthetic_cloud
from tests.oracle import reference_numpy as oracle

SPEC = RangeViewSpec()
CFG = DecodeConfig()


def test_empty_cloud_projection():
    pts = jnp.full((128, 4), jnp.nan)
    img = np.asarray(range_view_project(pts, SPEC))
    assert (img[..., 0] == 0).all()
    assert (img[..., 1] == SPEC.min_height).all()


def test_empty_prediction_decodes_to_nothing():
    y_pred = np.zeros((SPEC.height, SPEC.width, 26), np.float32)
    y_pred[..., 0] = 1.0  # all background
    img = np.zeros((SPEC.height, SPEC.width, 3), np.float32)
    out = decode_frame(jnp.asarray(y_pred), jnp.asarray(img), SPEC, CFG)
    assert not bool(out["found"])
    assert (np.asarray(out["pose"]) == 0).all()


def test_vehicle_behind_sensor_decodes(rng):
    """Vehicle at azimuth ~pi (columns near the 0/1800 wrap edges).

    The reference's decode scans columns ulx-100..lrx+100 without wrapping;
    our windowed vote clamps to the image — both see the same candidates.
    Verify the full decode against the oracle at the wrap."""
    vehicle = (-15.0, 0.3, -0.7)  # behind: azimuth ~ pi
    size = (4.2, 1.6, 1.5)
    cloud = synthetic_cloud(rng, n=6000, with_vehicle_at=vehicle)
    img = np.asarray(range_view_project(jnp.asarray(cloud), SPEC))
    lbl = np.asarray(
        encoding.encode_label(
            jnp.asarray(vehicle, jnp.float32),
            jnp.asarray(size, jnp.float32),
            jnp.float32(0.0),
            jnp.asarray(img),
            SPEC,
        )
    )
    # object projects near a wrap edge
    ccol, _ = boxes.project_2d(*[jnp.float32(v) for v in vehicle], SPEC)
    assert int(ccol) < 120 or int(ccol) > SPEC.width - 120

    out = decode_frame(jnp.asarray(lbl), jnp.asarray(img), SPEC, CFG)
    want_c, want_b, _ = oracle.find_obstacle(lbl[..., 1])
    if want_c is None:
        assert not bool(out["found"])
        return
    got_b = np.asarray(out["bbox_2d"])
    assert tuple(got_b[:2]) == want_b[0] and tuple(got_b[2:]) == want_b[1]
    if bool(out["found"]):
        want_xyz, _ = oracle.back_project(
            want_c, (want_b[0][0], want_b[0][1], want_b[1][0], want_b[1][1]),
            img[..., 0], img[..., 1],
        )
        want_pose, _ = oracle.find_bbox_3d(
            img[..., 0], img[..., 1], lbl.reshape(-1, 26), want_b, want_xyz[:3]
        )
        got = np.asarray(out["pose"])
        np.testing.assert_allclose(
            np.delete(got, 3), np.delete(want_pose, 3), rtol=1e-3, atol=5e-3
        )


def test_sample_roll_never_splits_object(rng):
    """The sampled azimuth roll must never wrap the footprint across the
    image edge (loader.py:44-47 rejection criterion)."""
    center = jnp.asarray([12.0, -4.0, -0.8], jnp.float32)
    size = jnp.asarray([4.2418, 1.4478, 1.5748], jnp.float32)
    yaw = jnp.float32(0.3)
    ul_x, _, lr_x, _ = (int(v) for v in boxes.outer_rect(center, size, yaw, SPEC))
    w = SPEC.width
    rolls = jax.vmap(
        lambda k: sample_roll(k, center, size, yaw, SPEC)
    )(jax.random.split(jax.random.PRNGKey(0), 512))
    rolls = np.asarray(rolls)
    assert (rolls >= 0).all() and (rolls < w).all()
    bad = (ul_x + rolls <= w) & (w <= lr_x + rolls)
    assert not bad.any(), rolls[bad][:5]


def test_vote_overflow_flagged():
    """More candidate pixels than the budget -> vote_overflow True, and
    the decode still returns a finite pose."""
    import dataclasses

    cfg = dataclasses.replace(CFG, max_candidates=64)
    y_pred = np.zeros((SPEC.height, SPEC.width, 26), np.float32)
    y_pred[..., 0] = 1.0
    # a wide solid detection: rows 8-24, cols 400-700 (>> 64 candidates)
    y_pred[8:24, 400:700, 1] = 0.9
    y_pred[8:24, 400:700, 0] = 0.1
    img = np.zeros((SPEC.height, SPEC.width, 3), np.float32)
    img[..., 0] = 15.0  # valid returns everywhere
    img[..., 1] = -0.5
    out = decode_frame(jnp.asarray(y_pred), jnp.asarray(img), SPEC, cfg)
    assert bool(out["vote_overflow"])
    assert np.isfinite(np.asarray(out["pose"])).all()

    # small detection stays under budget -> no overflow
    y_pred2 = np.zeros_like(y_pred)
    y_pred2[..., 0] = 1.0
    y_pred2[10:16, 500:520, 1] = 0.9
    y_pred2[10:16, 500:520, 0] = 0.1
    out2 = decode_frame(jnp.asarray(y_pred2), jnp.asarray(img), SPEC, CFG)
    assert not bool(out2["vote_overflow"])


def test_multi_blob_picks_largest_then_earliest(rng):
    from tpufusion.decode import find_obstacle

    prob = np.zeros((SPEC.height, SPEC.width), np.float32)
    prob[4:14, 100:160] = 1.0  # area candidate A
    prob[16:26, 900:960] = 1.0  # same shape, later in scan order
    prob[5:9, 1200:1215] = 1.0  # smaller
    want_c, want_b, want_a = oracle.find_obstacle(prob)
    got_c, got_b, got_a, found = find_obstacle(jnp.asarray(prob), CFG)
    assert bool(found)
    assert tuple(np.asarray(got_c)) == want_c
    assert float(got_a) == want_a
    got_b = np.asarray(got_b)
    assert (got_b[0], got_b[1]) == want_b[0] and (got_b[2], got_b[3]) == want_b[1]


def test_two_vehicle_scene_multi_decode_and_tracking(rng):
    """Two vehicles in one scene: top-K decode returns both (the reference
    could only ever emit its largest cluster, predict.py:58-71) and the
    tracker maintains two distinct tracks across frames."""
    from tpufusion.decode.decode import decode_frame_multi
    from tpufusion.serve.tracker import PoseTracker

    centers = np.asarray([[10.0, 3.0, -0.7], [9.0, -4.0, -0.7]])
    size = np.asarray([4.2, 1.6, 1.5])
    pts = synthetic_cloud(rng, n=4096, with_vehicle_at=tuple(centers[0]))
    extra = synthetic_cloud(rng, n=1, with_vehicle_at=tuple(centers[1]))
    pts = np.concatenate([pts, extra[1:]], axis=0)  # add 2nd cluster only
    img = range_view_project(jnp.asarray(pts), SPEC)

    # ground-truth labels for both vehicles, merged
    labs = [
        np.asarray(
            encoding.encode_label_batch(
                jnp.asarray(c)[None],
                jnp.asarray(size)[None],
                jnp.zeros((1,)),
                img[None],
                SPEC,
            )
        )[0]
        for c in centers
    ]
    fg = np.maximum(labs[0][..., 1], labs[1][..., 1])
    reg = np.where(labs[1][..., 1:2] > 0.5, labs[1][..., 2:], labs[0][..., 2:])
    merged = np.concatenate([(1.0 - fg)[..., None], fg[..., None], reg], -1)
    assert labs[0][..., 1].sum() > 0 and labs[1][..., 1].sum() > 0

    out = decode_frame_multi(
        jnp.asarray(merged), img, SPEC, CFG, k=4
    )
    poses = np.asarray(out["poses"])
    found = np.asarray(out["found"])
    assert int(found.sum()) == 2, (found, poses[:, :3])
    got = poses[found][:, :2]
    # each detection matches a distinct ground-truth vehicle
    d = np.linalg.norm(got[:, None, :] - centers[None, :, :2], axis=-1)
    best = d.min(axis=1)
    assert (best < 2.0).all(), d
    assert set(d.argmin(axis=1)) == {0, 1}

    # temporal tracking: both vehicles persist as separate tracks
    frames, k = 6, 4
    seq = np.zeros((frames, k, 7))
    fnd = np.zeros((frames, k), bool)
    for f in range(frames):
        seq[f, : len(got)] = poses[found]
        seq[f, : len(got), 0] += 0.3 * f  # forward motion
        fnd[f, : len(got)] = True
    tracker = PoseTracker(dt=0.1)
    trails = tracker.run_multi(seq, fnd)
    assert len(trails) == 2, trails.keys()
    for trail in trails.values():
        # n-of-m confirmation (min_hits=3): confirmed from frame 3 on
        assert len(trail) >= frames - 2
