"""On-device azimuth-roll augmentation.

The reference rolls each frame (image + flattened label) by a random number
of columns, rejecting rolls that would split the object across the 360°
wrap (`modules/lidar/train/loader.py:31-57`). Rejection sampling is
data-dependent, so instead we sample directly from the valid set: the
invalid shifts form one contiguous interval [W - lr_x, W - ul_x], so a
uniform draw over [0, W - n_invalid) mapped around that interval is exactly
the reference's distribution without the loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpufusion.config import RangeViewSpec
from tpufusion.geometry.boxes import outer_rect


def sample_roll(
    key: jax.Array,
    center: jax.Array,  # (3,)
    size: jax.Array,  # (3,)
    yaw: jax.Array,  # ()
    spec: RangeViewSpec,
) -> jax.Array:
    w = spec.width
    ul_x, _, lr_x, _ = outer_rect(center, size, yaw, spec)
    lo = jnp.clip(w - lr_x, 0, w)  # first invalid shift
    hi = jnp.clip(w - ul_x + 1, lo, w)  # one past last invalid shift
    n_invalid = hi - lo
    k = jax.random.randint(key, (), 0, jnp.maximum(w - n_invalid, 1))
    return jnp.where(k < lo, k, k + n_invalid)


def roll_frame(image: jax.Array, label: jax.Array, shift: jax.Array):
    """Roll both (H, W, C) tensors along the azimuth axis."""
    return (
        jnp.roll(image, shift, axis=1),
        jnp.roll(label, shift, axis=1),
    )


def transform_point_cloud(
    key: jax.Array,
    points: jax.Array,  # (N, >=3)
    max_rotation: float = jnp.pi,
    max_translation: float = 3.0,
):
    """Random z-rotation + xy-translation of a cloud.

    Point-cloud-space counterpart of `modules/lidar/common/
    transform_point_cloud.py:15-36` (which the reference left unwired —
    training augments in image space instead; both are available here).
    Returns (points', (angle, tx, ty)).
    """
    k1, k2 = jax.random.split(key)
    angle = jax.random.uniform(k1, (), minval=-max_rotation, maxval=max_rotation)
    txy = jax.random.uniform(
        k2, (2,), minval=-max_translation, maxval=max_translation
    )
    c, s = jnp.cos(angle), jnp.sin(angle)
    x = points[:, 0] * c - points[:, 1] * s + txy[0]
    y = points[:, 0] * s + points[:, 1] * c + txy[1]
    out = jnp.concatenate(
        [x[:, None], y[:, None], points[:, 2:]], axis=1
    )
    return out, (angle, txy[0], txy[1])


def augment_batch(
    key: jax.Array,
    images: jax.Array,  # (B, H, W, C)
    labels: jax.Array,  # (B, H, W, 26)
    centers: jax.Array,
    sizes: jax.Array,
    yaws: jax.Array,
    spec: RangeViewSpec,
):
    keys = jax.random.split(key, images.shape[0])
    shifts = jax.vmap(lambda k, c, s, y: sample_roll(k, c, s, y, spec))(
        keys, centers, sizes, yaws
    )
    return jax.vmap(roll_frame)(images, labels, shifts)
