"""Label codec: per-pixel local-frame corner-regression targets.

encode_label vectorizes `generate_label` (`modules/lidar/train/encoder.py:
156-238`) over the whole range-view image — the reference runs a pure-python
double loop over the box footprint. decode_corners is the exact inverse used
by the reference decode (`modules/lidar/train/predict.py:103-135`):

  encode:  c' = (Rz(theta) @ Ry(phi))^T (c - p)
  decode:  c  = (Rz(theta) @ Ry(phi)) c' + p

where theta/phi are the pixel's azimuth/elevation angles and p is the pixel's
back-projected 3D point from the distance/height channels. Both directions
are closed-form per pixel, so they vectorize to two batched (3,3)x(3,8)
matmuls over the image.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpufusion.config import RangeViewSpec
from tpufusion.geometry.boxes import (
    box_corners_3d,
    circle_rect,
    inner_rect,
    outer_rect,
    project_2d,
    rot_y,
    rot_z,
)


def pixel_angles(spec: RangeViewSpec, col_start=0, width: int | None = None):
    """Per-pixel (theta, phi): azimuth/elevation used by encode & decode.

    theta = (col + X_MIN) * res_h ; phi = (row + Y_MIN) * res_v
    (encoder.py:210-211 — note `row` is the already-flipped image row; the
    decode uses the identical convention so the pair stays self-inverse).

    col_start/width select a column window (used by the windowed decode).
    """
    width = spec.width if width is None else width
    rows = jnp.arange(spec.height, dtype=jnp.float32)
    cols = jnp.arange(width, dtype=jnp.float32) + col_start
    theta = (cols + spec.x_min) * spec.res_h_rad  # (W,)
    phi = (rows + spec.y_min) * spec.res_v_rad  # (H,)
    theta = jnp.broadcast_to(theta[None, :], (spec.height, width))
    phi = jnp.broadcast_to(phi[:, None], (spec.height, width))
    return theta, phi


def pixel_points(image: jax.Array, spec: RangeViewSpec, col_start=0):
    """Back-project every pixel to 3D: p = (d cos t, -d sin t, height).

    `image` is (H, W', >=2) with channel 0 = distance, 1 = height.
    """
    theta, _ = pixel_angles(spec, col_start, image.shape[1])
    d = image[..., 0]
    h = image[..., 1]
    return jnp.stack([d * jnp.cos(theta), -d * jnp.sin(theta), h], axis=-1)


def pixel_rotations(spec: RangeViewSpec, col_start=0, width: int | None = None):
    """R = Rz(theta) @ Ry(phi) per pixel: (H, W', 3, 3)."""
    theta, phi = pixel_angles(spec, col_start, width)
    return jnp.einsum("hwij,hwjk->hwik", rot_z(theta), rot_y(phi), precision="highest")


def _pyslice_mask(lo, hi, n: int, idx: jax.Array) -> jax.Array:
    """Boolean mask equivalent to numpy's arr[lo:hi] slice assignment over an
    axis of length n, including negative-index wrap (the reference assigns
    label[ul_y:lr_y, ul_x:lr_x] = 1 with raw projected ints)."""
    lo = jnp.where(lo < 0, lo + n, lo)
    hi = jnp.where(hi < 0, hi + n, hi)
    lo = jnp.clip(lo, 0, n)
    hi = jnp.clip(hi, 0, n)
    return (idx >= lo) & (idx < hi)


def footprint_mask(
    center, size, yaw, spec: RangeViewSpec, method: str = "outer_rect"
) -> jax.Array:
    """(H, W) float32 0/1 mask of the classification footprint.

    The reference's three label methods (`get_label_bounds`,
    encoder.py:145-154): "outer_rect" (bbox of the 4 projected corners
    farthest from the projected centroid — the training default),
    "inner_rect" (the 4 nearest), and "circle" (a disk of radius
    min(circle-rect half-dims) around the PROJECTED CENTROID, painted
    inside the circle rect — encoder.py:124-143; note the disk centers on
    the centroid while the rect centers on the inner rect, a faithful
    quirk)."""
    rows = jnp.arange(spec.height, dtype=jnp.int32)
    cols = jnp.arange(spec.width, dtype=jnp.int32)
    if method == "circle":
        ul_x, ul_y, lr_x, lr_y = circle_rect(center, size, yaw, spec)
        # the reference paints with `for x in range(int(ul), int(lr))` +
        # label[y, x] — python range + negative-index wrap. The virtual
        # coordinate vx = ul + (c - ul) mod W maps each wrapped column
        # back to its loop value so the centroid-distance test matches.
        ul_xi, lr_xi = ul_x.astype(jnp.int32), lr_x.astype(jnp.int32)
        ul_yi, lr_yi = ul_y.astype(jnp.int32), lr_y.astype(jnp.int32)
        vx = ul_xi + jnp.mod(cols - ul_xi, spec.width)
        vy = ul_yi + jnp.mod(rows - ul_yi, spec.height)
        in_rect = (vy[:, None] < lr_yi) & (vx[None, :] < lr_xi)
        r = jnp.minimum(lr_y - ul_y, lr_x - ul_x) / 2.0
        pcol, prow = project_2d(center[0], center[1], center[2], spec)
        dist2 = (
            (vx[None, :] - pcol).astype(jnp.float32) ** 2
            + (vy[:, None] - prow).astype(jnp.float32) ** 2
        )
        return (in_rect & (dist2 <= r * r)).astype(jnp.float32)
    rect = {"outer_rect": outer_rect, "inner_rect": inner_rect}[method]
    ul_x, ul_y, lr_x, lr_y = rect(center, size, yaw, spec)
    rmask = _pyslice_mask(ul_y, lr_y, spec.height, rows)
    cmask = _pyslice_mask(ul_x, lr_x, spec.width, cols)
    return (rmask[:, None] & cmask[None, :]).astype(jnp.float32)


def encode_label(
    center: jax.Array,  # (3,) tx, ty, tz
    size: jax.Array,  # (3,) l, w, h
    yaw: jax.Array,  # ()
    image: jax.Array,  # (H, W, >=2) distance/height channels
    spec: RangeViewSpec = RangeViewSpec(),
    method: str = "outer_rect",
) -> jax.Array:
    """One frame's training target: (H, W, 2 + 24) float32.

    Channels 0..1 = one-hot (background, foreground) from the `method`
    footprint (outer_rect / inner_rect / circle, like generate_label's
    method param); 2..25 = per-pixel local-frame corner offsets, zero
    outside the footprint. The reference returns the same content
    flattened to (H*W, 26) and — bug — cast to uint8, which destroys the
    regression targets (`loader.py:251`); we keep float32 and note the
    divergence.
    """
    mask = footprint_mask(center, size, yaw, spec, method)  # (H, W)

    corners = box_corners_3d(center, size, yaw)  # (8, 3)
    p = pixel_points(image, spec)  # (H, W, 3)
    rot = pixel_rotations(spec)  # (H, W, 3, 3)
    # c' = R^T (c - p): (H, W, 8, 3)
    diff = corners[None, None, :, :] - p[:, :, None, :]
    c_prime = jnp.einsum("hwji,hwkj->hwki", rot, diff, precision="highest")
    reg = c_prime.reshape(*mask.shape, 24) * mask[..., None]

    onehot = jnp.stack([1.0 - mask, mask], axis=-1)
    return jnp.concatenate([onehot, reg], axis=-1)


def decode_corners(
    reg: jax.Array,  # (H, W', 24) predicted local-frame corner offsets
    image: jax.Array,  # (H, W', >=2) distance/height channels
    spec: RangeViewSpec = RangeViewSpec(),
    col_start=0,
) -> jax.Array:
    """Invert encode_label over every pixel: (H, W', 8, 3) world-frame corners.

    c = R c' + p  (predict.py:118-131), batched over the image. col_start
    offsets the azimuth when reg/image are a column window of the full view.
    """
    h, w = reg.shape[:2]
    c_prime = reg.reshape(h, w, 8, 3)
    p = pixel_points(image, spec, col_start)
    rot = pixel_rotations(spec, col_start, w)
    c = jnp.einsum("hwij,hwkj->hwki", rot, c_prime, precision="highest") + p[:, :, None, :]
    return c


def encode_label_batch(centers, sizes, yaws, images, spec: RangeViewSpec):
    """vmapped encode_label: (B,3),(B,3),(B,),(B,H,W,C) -> (B,H,W,26)."""
    return jax.vmap(lambda c, s, y, im: encode_label(c, s, y, im, spec))(
        centers, sizes, yaws, images
    )


# ---------------------------------------------------------------------------
# Direct-pose head targets (framework extension; ModelConfig.head="direct").
# The reference's 24-dim corner field does not converge at this model scale
# (NOTES.md round-2 session 3); a per-pixel (center offset, size, yaw)
# target is low-variance on surface pixels and decodes by masked averaging.
# ---------------------------------------------------------------------------

DIRECT_CHANNELS = 8  # dc (3 local-frame), l w h (3), sin yaw, cos yaw
DIRECT_CHANNELS_DUAL = 10  # + global sin/cos pair (yaw_frame="both")


def box_surface_mask(
    center: jax.Array,  # (3,)
    size: jax.Array,  # (3,)
    yaw: jax.Array,  # ()
    image: jax.Array,  # (H, W, >=2)
    spec: RangeViewSpec = RangeViewSpec(),
    margin: float = 0.25,
) -> jax.Array:
    """(H, W) float32 mask of OCCUPIED pixels whose raw return lies inside
    the (margin-dilated) physical box.

    The reference's outer-rect footprint (encoder.py:164-168, bbox of the
    4 projected corners farthest from the projected centroid) degenerates
    on oblique views: for a broadside vehicle at 12 m the box spans ~100
    columns but the rect collapses to the ~5 columns of the far-side
    face — so the fg label itself sits half a vehicle length off-center,
    and rays through the rect that miss the vehicle label distant clutter
    as foreground (the contamination reg_target_norm_clip fights). The
    direct head is a framework extension, so it trains on the actual
    surface: transform each pixel's return into the box frame and test
    containment.
    """
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    c_phys = jnp.stack(
        [
            c * center[0] - s * center[1],
            s * center[0] + c * center[1],
            center[2],
        ]
    )
    p = pixel_points(image, spec)  # (H, W, 3)
    rel = p - c_phys[None, None, :]
    # box frame: the physical box is Rz(yaw) applied to the axis-aligned
    # box (box_corners_3d), so project rel onto the rotated axes
    qx = c * rel[..., 0] + s * rel[..., 1]
    qy = -s * rel[..., 0] + c * rel[..., 1]
    qz = rel[..., 2]
    half = size / 2.0 + margin
    inside = (
        (jnp.abs(qx) <= half[0])
        & (jnp.abs(qy) <= half[1])
        & (jnp.abs(qz) <= half[2])
    )
    occupied = image[..., 0] > 0
    return (inside & occupied).astype(jnp.float32)


def encode_direct_label(
    center: jax.Array,  # (3,)
    size: jax.Array,  # (3,)
    yaw: jax.Array,  # ()
    image: jax.Array,  # (H, W, >=2)
    spec: RangeViewSpec = RangeViewSpec(),
    footprint: str = "surface",
    yaw_frame: str = "local",
) -> jax.Array:
    """(H, W, 2 + 8) target: [bkg, fg, dc(3), lwh(3), sin yaw, cos yaw]
    (yaw_frame="both": 2 + 10, sin/cos local then sin/cos global).

    dc = R^T (c_phys - p) in the pixel's local frame (same frame as the
    corner codec, so it is exactly invariant under azimuth rolls), with
    c_phys = Rz(yaw) @ center — the box's physical position under the
    reference's orbit-origin convention (box_corners_3d).

    yaw_frame="local" supervises sin/cos(yaw - theta_pixel) — yaw in each
    pixel's viewing-ray frame. A conv trunk is translation-equivariant
    along azimuth while the visible arc only encodes orientation RELATIVE
    to the ray, so global sin/cos targets memorize but cannot generalize
    (DecodeConfig.direct_yaw_frame documents the measurement); local
    targets are learnable and, like dc, exactly roll-invariant.
    "global" keeps the raw sin/cos(yaw) codec for assets trained with it.

    footprint="surface" paints fg on the box's actual surface returns
    (box_surface_mask — the fix for the outer-rect's oblique-view
    degeneracy); "rect" keeps the reference's outer-rect semantics for
    comparison.
    """
    if footprint == "surface":
        mask = box_surface_mask(center, size, yaw, image, spec)
    else:
        mask = footprint_mask(center, size, yaw, spec)  # (H, W)
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    c_phys = jnp.stack(
        [
            c * center[0] - s * center[1],
            s * center[0] + c * center[1],
            center[2],
        ]
    )
    p = pixel_points(image, spec)  # (H, W, 3)
    rot = pixel_rotations(spec)  # (H, W, 3, 3)
    dc = jnp.einsum(
        "hwji,hwj->hwi", rot, c_phys[None, None, :] - p, precision="highest"
    )  # (H, W, 3) — R^T (c_phys - p)
    hw = mask.shape
    lwh = jnp.broadcast_to(size[None, None, :], (*hw, 3))
    if yaw_frame in ("local", "both"):
        # the pixel's physical ray azimuth is -theta (the image column
        # axis is mirrored vs world azimuth, following the reference's
        # projection flips), so yaw-relative-to-ray = yaw - (-theta)
        theta, _ = pixel_angles(spec)  # (H, W)
        sc = jnp.stack([jnp.sin(yaw + theta), jnp.cos(yaw + theta)], axis=-1)
        if yaw_frame == "both":
            # dual codec (ModelConfig.yaw_codec="dual"): local pair then
            # global pair — decode gates per cluster on which codec's
            # predicted vectors kept their magnitude
            sc_g = jnp.broadcast_to(
                jnp.stack([jnp.sin(yaw), jnp.cos(yaw)])[None, None, :],
                (*hw, 2),
            )
            sc = jnp.concatenate([sc, sc_g], axis=-1)
    elif yaw_frame == "global":
        sc = jnp.broadcast_to(
            jnp.stack([jnp.sin(yaw), jnp.cos(yaw)])[None, None, :], (*hw, 2)
        )
    else:
        raise ValueError(f"unknown yaw_frame {yaw_frame!r}")
    reg = jnp.concatenate([dc, lwh, sc], axis=-1) * mask[..., None]
    onehot = jnp.stack([1.0 - mask, mask], axis=-1)
    return jnp.concatenate([onehot, reg], axis=-1)


def encode_direct_label_batch(centers, sizes, yaws, images, spec,
                              footprint: str = "surface",
                              yaw_frame: str = "local"):
    """vmapped encode_direct_label -> (B, H, W, 10)."""
    return jax.vmap(
        lambda c, s, y, im: encode_direct_label(
            c, s, y, im, spec, footprint, yaw_frame
        )
    )(centers, sizes, yaws, images)
