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


def render_radar_boxes_on_camera(
    image_bgr: np.ndarray,  # (H, W, 3) uint8
    tracks,  # iterable of data.radar.RadarTrack (or dicts with range/angle)
    camera,  # geometry.camera.CameraModel
    box_lwh: tuple = (4.2418, 1.574, 1.5748),
    crop_top: int = 0,
) -> np.ndarray:
    """Radar-derived 3D boxes drawn onto a camera frame.

    Matches `modules/lidar/process/process_radar_data.py:122-141` +
    `common/camera_model.py:69-89`: each radar return becomes a nominal
    vehicle box at its range/angle (with the radar->lidar mount offset
    applied by RadarTrack.to_xyz); the centroid is drawn blue, the top
    four corners green, the bottom four red, as filled circles."""
    import cv2

    from tpufusion.data.radar import RadarTrack

    l, w, h = box_lwh
    canvas = image_bgr.copy()
    for t in tracks:
        if isinstance(t, dict):
            t = RadarTrack(
                timestamp=int(t.get("timestamp", 0)),
                range=float(t["range"]),
                angle=float(t["angle"]),
                rate=float(t.get("rate", 0.0)),
                status=float(t.get("status", 0.0)),
            )
        tx, ty, tz = t.to_xyz()
        pts = [
            (tx, ty, tz),  # centroid — blue
            (tx - l / 2, ty + w / 2, tz + h / 2),  # top 4 — green
            (tx - l / 2, ty - w / 2, tz + h / 2),
            (tx + l / 2, ty + w / 2, tz + h / 2),
            (tx + l / 2, ty - w / 2, tz + h / 2),
            (tx + l / 2, ty - w / 2, tz - h / 2),  # bottom 4 — red
            (tx - l / 2, ty + w / 2, tz - h / 2),
            (tx - l / 2, ty - w / 2, tz - h / 2),
            (tx + l / 2, ty + w / 2, tz - h / 2),
        ]
        uv = camera.project_lidar_to_pixels(np.asarray(pts, float))
        hh, ww = canvas.shape[:2]
        for pos, (u, v) in enumerate(uv):
            color = (
                (255, 0, 0) if pos == 0
                else (0, 255, 0) if pos < 5
                else (0, 0, 255)
            )
            u, v = int(round(u)), int(round(v)) - crop_top
            if 0 <= u < ww and 0 <= v < hh:
                cv2.circle(canvas, (u, v), 5, color, thickness=-1)
    return canvas


def detect_edges(
    img: np.ndarray, threshold1: float = 100, threshold2: float = 200
) -> np.ndarray:
    """Canny edge map (`modules/video/edge_detection.py:14-17`; the
    reference's comment records Canny beating Sobel on its test set)."""
    import cv2

    return cv2.Canny(img, threshold1, threshold2)
