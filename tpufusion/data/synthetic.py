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
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Returns (points (B, N, 4), gt dict with center/size/yaw (B, ...))."""
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
    yaw = jax.random.uniform(keys[6], (b,), minval=-0.6, maxval=0.6)
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
