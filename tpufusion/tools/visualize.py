"""Visualization: range-view / BEV renders with box overlays.

The reference's de-facto regression checks were rendered PNGs — bbox
overlays from `encoder.py:330-377`, class-mask exports from
`predict.py:507-522`, the pyglet bag viewers under `modules/video/`, and
rviz. This module renders the same artifacts headlessly (no pyglet/rviz):
range-view channels with the projected box, BEV rasters with the BEV box,
and predicted class masks.
"""

from __future__ import annotations

import numpy as np

from tpufusion.config import BevSpec, RangeViewSpec


def _to_u8(img: np.ndarray) -> np.ndarray:
    lo, hi = float(np.min(img)), float(np.max(img))
    if hi <= lo:
        return np.zeros_like(img, np.uint8)
    return ((img - lo) / (hi - lo) * 255).astype(np.uint8)


def render_range_view(
    image: np.ndarray,  # (H, W, 3) distance/height/intensity
    center=None,
    size=None,
    yaw=None,
    spec: RangeViewSpec = RangeViewSpec(),
) -> np.ndarray:
    """(H, W, 3) uint8 BGR with the projected box overlay (if pose given)."""
    import cv2
    import jax.numpy as jnp

    canvas = cv2.cvtColor(_to_u8(image[..., 0]), cv2.COLOR_GRAY2BGR)
    if center is not None:
        from tpufusion.geometry.boxes import (
            outer_rect,
            project_2d,
            sorted_projected_corners,
        )

        c = jnp.asarray(center, jnp.float32)
        s = jnp.asarray(size, jnp.float32)
        y = jnp.asarray(yaw, jnp.float32)
        corners = np.asarray(sorted_projected_corners(c, s, y, spec))
        for px, py in corners:
            cv2.circle(canvas, (int(px), int(py)), 2, (255, 255, 255), -1)
        ulx, uly, lrx, lry = [int(v) for v in outer_rect(c, s, y, spec)]
        cv2.rectangle(canvas, (ulx, uly), (lrx, lry), (0, 255, 0), 1)
        ccol, crow = project_2d(c[0], c[1], c[2], spec)
        cv2.circle(canvas, (int(ccol), int(crow)), 2, (0, 0, 255), -1)
    return canvas


def render_class_mask(prob_map: np.ndarray, bbox=None) -> np.ndarray:
    """White car pixels + red decode bbox, like predict.py:451-486."""
    import cv2

    mask = (np.round(prob_map) * 255).astype(np.uint8)
    canvas = cv2.cvtColor(mask, cv2.COLOR_GRAY2BGR)
    if bbox is not None and not all(int(v) == 0 for v in bbox):
        l, t, r, b = [int(v) for v in bbox]
        cv2.rectangle(canvas, (l, t), (r, b), (0, 0, 255), 2)
    return canvas


def render_bev(
    bev_image: np.ndarray,  # (nx, ny, C) raster from bev_rasterize
    center=None,
    size=None,
    yaw=None,
    spec: BevSpec = BevSpec(),
) -> np.ndarray:
    """Density channel as grayscale with the rotated BEV box overlay —
    the drawing `draw_obs_bb_on_birds_eye_view.py` named but never built."""
    import cv2

    canvas = cv2.cvtColor(_to_u8(bev_image[..., 0]), cv2.COLOR_GRAY2BGR)
    if center is not None:
        cx, cy = float(center[0]), float(center[1])
        l, w = float(size[0]), float(size[1])
        c, s = np.cos(float(yaw)), np.sin(float(yaw))
        dx = np.asarray([l, l, -l, -l]) / 2
        dy = np.asarray([w, -w, -w, w]) / 2
        xs = cx + c * dx - s * dy
        ys = cy + s * dx + c * dy
        # grid index before the double flip: ix = (x+R)/res_x
        ix = (xs + spec.max_range) / spec.res_x
        iy = (ys + spec.max_range) / spec.res_y
        # undo flips: row = nx-1-ix, col = ny-1-iy; draw in (col,row)
        pts = np.stack(
            [spec.ny - 1 - iy, spec.nx - 1 - ix], axis=-1
        ).astype(np.int32)
        cv2.polylines(canvas, [pts.reshape(-1, 1, 2)], True, (0, 255, 0), 1)
    return canvas


def save(path: str, canvas: np.ndarray) -> None:
    import cv2

    cv2.imwrite(path, canvas)
