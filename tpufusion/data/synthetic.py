"""Synthetic scene generation for tests, benchmarks, and training demos.

The Didi challenge bags are not redistributable, so the framework ships a
deterministic scene synthesizer: a ground ring + uniform clutter + a dense
box-shaped cluster for the obstacle vehicle, with the ground-truth pose
expressed in the reference's corner convention (the box footprint orbits the
sensor origin by yaw — `modules/lidar/train/encoder.py:47-60` — so the
cluster is placed at Rz(yaw) @ center).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def synthesize_points_batch(
    key: jax.Array,
    batch: int,
    n_points: int = 16384,
    max_range: float = 60.0,
    max_yaw: float = 0.6,
    vary_size: bool = False,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Returns (points (B, N, 4), gt dict with center/size/yaw (B, ...)).

    vary_size=True draws l/w/h from vehicle-like ranges instead of the
    fixed (4.2, 1.6, 1.5) — used to train size-predicting heads so the
    network must measure the cluster rather than memorise a constant.

    NB on max_yaw: the reference's corner convention orbits the box about
    the SENSOR ORIGIN by yaw (encoder.py:47-60), so the physical cluster
    sits at Rz(yaw) @ center while gt center stays unrotated. The cluster
    itself is axis-aligned, so yaw is UNOBSERVABLE from the image — with
    large |yaw| the pose-regression target is unlearnable and any decoded
    pose lands ~2 sin(|yaw|/2) * dist from gt (measured: that term alone
    explains 0.7-20 m "errors"). Detector training/eval scenes should use
    max_yaw ~ 0 (the reference's own real-data regime: the lead vehicle's
    rz was near zero); the default 0.6 keeps the historical distribution
    for geometry/projection tests, where yaw only moves the cluster."""
    keys = jax.random.split(key, 8)
    b, n = batch, n_points

    az = jax.random.uniform(keys[0], (b, n), minval=-np.pi, maxval=np.pi)
    rng_r = jax.random.uniform(keys[1], (b, n), minval=2.0, maxval=max_range)
    z = jax.random.uniform(keys[2], (b, n), minval=-1.9, maxval=0.5)
    intensity = jax.random.uniform(keys[3], (b, n), minval=0.0, maxval=100.0)
    x = rng_r * jnp.cos(az)
    y = rng_r * jnp.sin(az)

    # ground-truth pose
    dist = jax.random.uniform(keys[4], (b,), minval=8.0, maxval=30.0)
    angle = jax.random.uniform(keys[5], (b,), minval=-np.pi, maxval=np.pi)
    center = jnp.stack(
        [
            dist * jnp.cos(angle),
            dist * jnp.sin(angle),
            jnp.full((b,), -0.7),
        ],
        axis=-1,
    )
    yaw = jax.random.uniform(keys[6], (b,), minval=-max_yaw, maxval=max_yaw)
    if vary_size:
        lo = jnp.asarray([3.5, 1.4, 1.2])
        hi = jnp.asarray([5.5, 2.1, 1.9])
        size = jax.random.uniform(
            jax.random.fold_in(key, 11), (b, 3), minval=lo, maxval=hi
        )
    else:
        size = jnp.broadcast_to(jnp.asarray([4.2, 1.6, 1.5]), (b, 3))

    # dense vehicle cluster at the rotated spot, occupying the last n//8 slots
    m = n // 8
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    spot = jnp.stack(
        [
            c * center[:, 0] - s * center[:, 1],
            s * center[:, 0] + c * center[:, 1],
            center[:, 2],
        ],
        axis=-1,
    )
    offs = jax.random.uniform(keys[7], (b, m, 3), minval=-1.0, maxval=1.0)
    half = size[:, None, :] / 2.0 * jnp.asarray([0.95, 0.95, 0.95])
    vpts = spot[:, None, :] + offs * half

    x = x.at[:, -m:].set(vpts[..., 0])
    y = y.at[:, -m:].set(vpts[..., 1])
    z = z.at[:, -m:].set(vpts[..., 2])

    points = jnp.stack([x, y, z, intensity], axis=-1).astype(jnp.float32)
    gt = {"center": center, "size": size, "yaw": yaw}
    return points, gt


def _clutter_with_clusters(
    kclutter: jax.Array,
    koffs: jax.Array,
    batch: int,
    n_points: int,
    centers: jax.Array,  # (B, V, 3) physical cluster centers
    sizes: jax.Array,  # (B, V, 3)
    max_range: float,
) -> jax.Array:
    """Shared scene assembly: uniform clutter ring + one dense box cluster
    per (frame, vehicle) stamped into the last V*m point slots. Returns
    points (B, N, 4)."""
    b, n = batch, n_points
    v = centers.shape[1]
    ks = jax.random.split(kclutter, 4)
    az = jax.random.uniform(ks[0], (b, n), minval=-np.pi, maxval=np.pi)
    rng_r = jax.random.uniform(ks[1], (b, n), minval=2.0, maxval=max_range)
    z = jax.random.uniform(ks[2], (b, n), minval=-1.9, maxval=0.5)
    intensity = jax.random.uniform(ks[3], (b, n), minval=0.0, maxval=100.0)
    x = rng_r * jnp.cos(az)
    y = rng_r * jnp.sin(az)

    m = (n // 8) // v  # points per vehicle cluster
    offs = jax.random.uniform(koffs, (b, v, m, 3), minval=-1.0, maxval=1.0)
    half = sizes[:, :, None, :] / 2.0 * 0.95
    vpts = centers[:, :, None, :] + offs * half  # (B, V, m, 3)
    vflat = vpts.reshape(b, v * m, 3)

    x = x.at[:, -v * m:].set(vflat[..., 0])
    y = y.at[:, -v * m:].set(vflat[..., 1])
    z = z.at[:, -v * m:].set(vflat[..., 2])
    return jnp.stack([x, y, z, intensity], axis=-1).astype(jnp.float32)


def synthesize_multi_vehicle_batch(
    key: jax.Array,
    batch: int,
    n_points: int = 16384,
    n_vehicles: int = 2,
    max_range: float = 60.0,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Multi-obstacle scenes: V dense box clusters per frame at distinct
    azimuths (>= 0.7 rad apart so clusters never merge in the range
    view). Returns (points (B, N, 4), gt with center (B, V, 3), size
    (B, V, 3), yaw (B, V)). Feeds the top-K decode + multi-object
    tracking paths (the reference's decode could only ever emit its
    largest cluster, predict.py:58-71)."""
    assert 1 <= n_vehicles <= 5, (
        "slot spacing 2*pi/v with +-0.3 jitter keeps clusters disjoint "
        f"only for v <= 5 (got {n_vehicles})"
    )
    keys = jax.random.split(key, 4)
    b, v = batch, n_vehicles

    # vehicle angular slots: evenly spaced base angles + small jitter keep
    # every pair >= ~0.7 rad apart after the per-frame random rotation
    base = jnp.linspace(0.0, 2.0 * np.pi, v, endpoint=False)
    frame_rot = jax.random.uniform(
        keys[0], (b, 1), minval=-np.pi, maxval=np.pi
    )
    jitter = jax.random.uniform(keys[1], (b, v), minval=-0.3, maxval=0.3)
    angle = base[None, :] + frame_rot + jitter
    dist = jax.random.uniform(keys[2], (b, v), minval=8.0, maxval=30.0)
    center = jnp.stack(
        [dist * jnp.cos(angle), dist * jnp.sin(angle),
         jnp.full((b, v), -0.7)], axis=-1,
    )  # (B, V, 3)
    yaw = jnp.zeros((b, v))  # keep clusters axis-aligned at their spot
    size = jnp.broadcast_to(jnp.asarray([4.2, 1.6, 1.5]), (b, v, 3))

    points = _clutter_with_clusters(
        keys[3], jax.random.fold_in(key, 99), b, n_points, center, size,
        max_range,
    )
    return points, {"center": center, "size": size, "yaw": yaw}


def synthesize_tracking_sequence(
    key: jax.Array,
    frames: int,
    n_points: int = 16384,
    n_vehicles: int = 2,
    dt: float = 0.1,
    max_range: float = 60.0,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Temporal sequence for multi-object tracking: V vehicles follow
    constant-velocity paths (per-axis speed <= 2 m/s, so planar speed up
    to 2*sqrt(2)) while background clutter is resampled every frame. Returns (points (F, N, 4), gt with center
    (F, V, 3), size (F, V, 3), yaw (F, V)). This is what BASELINE
    config 5's "multi-frame temporal tracking" actually needs — frames
    that are a coherent sequence, not independent scenes."""
    kframe, klayout, kvel = jax.random.split(key, 3)
    f, v = frames, n_vehicles

    # one layout + per-vehicle velocity, advanced over frames
    _, gt0 = synthesize_multi_vehicle_batch(klayout, 1, 64, v, max_range)
    c0 = gt0["center"][0]  # (V, 3)
    vel = jax.random.uniform(kvel, (v, 3), minval=-2.0, maxval=2.0)
    vel = vel.at[:, 2].set(0.0)
    t = jnp.arange(f, dtype=jnp.float32)[:, None, None] * dt
    centers = c0[None] + vel[None] * t  # (F, V, 3)

    # per-frame clutter + clusters at the advanced centers
    k1, k2 = jax.random.split(kframe)
    b = f
    size = jnp.broadcast_to(jnp.asarray([4.2, 1.6, 1.5]), (b, v, 3))
    points = _clutter_with_clusters(
        k1, k2, b, n_points, centers, size, max_range
    )
    return points, {"center": centers, "size": size, "yaw": jnp.zeros((b, v))}


def synthesize_dataset(
    seed: int, num_frames: int, n_points: int = 16384
) -> dict[str, np.ndarray]:
    """Host-side arrays for a whole synthetic sequence."""
    pts, gt = synthesize_points_batch(
        jax.random.PRNGKey(seed), num_frames, n_points
    )
    return {
        "points": np.asarray(pts),
        "center": np.asarray(gt["center"]),
        "size": np.asarray(gt["size"]),
        "yaw": np.asarray(gt["yaw"]),
        "timestamp": np.arange(num_frames, dtype=np.int64) * 100_000_000
        + 1_490_000_000_000_000_000,
    }
