"""Population statistics feeding the class-balanced loss.

The reference runs a full python dataset pass calling generate_label per
frame (`modules/lidar/train/pretrain.py:8-58`). Here the footprint areas
come from one vmapped device call over the ground-truth poses — no pixel
loops and no image reads (the footprint only depends on the pose).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpufusion.config import RangeViewSpec
from tpufusion.geometry.encoding import footprint_mask


def population_weights(
    centers: np.ndarray,  # (F, 3)
    sizes: np.ndarray,  # (F, 3)
    yaws: np.ndarray,  # (F,)
    spec: RangeViewSpec = RangeViewSpec(),
) -> dict[str, float]:
    """positive_to_negative_ratio and average_area over the dataset,
    with pretrain.py:21-32 semantics (frames with an empty footprint are
    excluded from the averages)."""

    @jax.jit
    def areas_fn(c, s, y):
        return jax.vmap(
            lambda ci, si, yi: jnp.sum(footprint_mask(ci, si, yi, spec))
        )(c, s, y)

    areas = np.asarray(
        areas_fn(
            jnp.asarray(centers, jnp.float32),
            jnp.asarray(sizes, jnp.float32),
            jnp.asarray(yaws, jnp.float32),
        )
    )
    total_px = spec.height * spec.width
    nonempty = areas > 0
    positive = float(areas[nonempty].sum())
    samples = float(total_px * nonempty.sum())
    count = int(nonempty.sum())
    if count == 0:
        return {"positive_to_negative_ratio": 0.0, "average_area": 0.0}
    return {
        "positive_to_negative_ratio": positive / (samples - positive),
        "average_area": positive / count,
    }
