"""NumPy oracle: an independent re-statement of the reference semantics used
as ground truth in golden tests. Written from the behavioral spec in
SURVEY.md (not copied from the reference); matches, notably:

  * modules/lidar/process/extract_rosbag_lidar.py:18-86 (range view,
    descending-L2 overwrite order so the nearest point wins),
  * modules/lidar/common/birds_eye_view_generator.py:31-54 (histogram2d +
    MV3D log normalization + double flip),
  * modules/lidar/train/encoder.py:22-238 (projection, corner sort, label),
  * modules/lidar/train/predict.py:33-199,230-293 (decode).
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import label as scipy_label

# ---- geometry constants (reference process/globals.py) ----
RES = (1.33, 0.2)
RES_RAD = np.array(RES) * np.pi / 180.0
VFOV = (-30.67, 10.67)
X_MIN = -360.0 / RES[1] / 2
Y_MIN = VFOV[0] / RES[0]
X_MAX = int(360.0 / RES[1])
Y_MAX = int(abs(VFOV[0] - VFOV[1]) / RES[0])
LIDAR_MIN_HEIGHT = -2.0
H, W = Y_MAX + 1, X_MAX + 1


def range_view(points: np.ndarray) -> dict[str, np.ndarray]:
    """points (N,4) -> dict of float (H,W) images for the three channels."""
    x, y, z, r = points[:, 0], points[:, 1], points[:, 2], points[:, 3]
    distance = np.sqrt(x**2 + y**2)
    l2 = np.sqrt(x**2 + y**2 + z**2)
    cols = (np.arctan2(-y, x) / RES_RAD[1] - X_MIN).astype(int)
    rows = (np.arcsin(z / l2) / RES_RAD[0] - Y_MIN).astype(int)

    order = np.flipud(np.argsort(l2, kind="stable"))
    out = {}
    for name, vals, fill in (
        ("distance", distance, 0.0),
        ("height", z, LIDAR_MIN_HEIGHT),
        ("intensity", r, 0.0),
    ):
        img = np.full((H, W), fill)
        img[rows[order], cols[order]] = vals[order]
        out[name] = np.flipud(img)
    return out


def bev_density(points: np.ndarray, max_range=120.0, res=(1.33, 0.2)):
    bins = (
        np.arange(-max_range, max_range, res[1]),
        np.arange(-max_range, max_range, res[0]),
    )
    density, _, _ = np.histogram2d(points[:, 0], points[:, 1], bins=bins)
    norm = np.zeros_like(density)
    nz = density > 0
    norm[nz] = 255.0 * np.minimum(np.log(density[nz] + 1) / np.log(64), 1.0)
    return np.flipud(np.fliplr(norm))


def project_2d(tx, ty, tz):
    l2 = np.sqrt(tx**2 + ty**2 + tz**2)
    col = int(np.arctan2(-ty, tx) / RES_RAD[1] - X_MIN)
    row = int(np.arcsin(tz / l2) / RES_RAD[0] - Y_MIN)
    row = max(0, min(row, Y_MAX))
    return col, Y_MAX - row


def box_corners(center, size, yaw):
    tx, ty, tz = center
    l, w, h = size
    c, s = np.cos(yaw), np.sin(yaw)
    rz = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    signs = np.array(
        [
            [-1, 1, 1], [-1, 1, -1], [-1, -1, 1], [-1, -1, -1],
            [1, 1, 1], [1, 1, -1], [1, -1, 1], [1, -1, -1],
        ],
        dtype=float,
    )
    corners = np.array([tx, ty, tz]) + signs * np.array([l, w, h]) / 2.0
    return corners @ rz.T


def sorted_corners_2d(center, size, yaw):
    corners = box_corners(center, size, yaw)
    proj = np.array([project_2d(*c) for c in corners])
    pc = np.array(project_2d(*center))
    d = np.sqrt(((proj - pc) ** 2).sum(axis=1))
    return proj[np.argsort(d, kind="stable")]


def outer_rect(center, size, yaw):
    pts = sorted_corners_2d(center, size, yaw)[-4:]
    return (pts[:, 0].min(), pts[:, 1].min()), (pts[:, 0].max(), pts[:, 1].max())


def inner_rect(center, size, yaw):
    pts = sorted_corners_2d(center, size, yaw)[:4]
    return (pts[:, 0].min(), pts[:, 1].min()), (pts[:, 0].max(), pts[:, 1].max())


def footprint_label(center, size, yaw, shape, method="outer_rect"):
    """(H, W) 0/1 fg mask per the reference's generate_label /
    generate_label_from_circle loop semantics (encoder.py:124-143,
    156-168), incl. python slice/range negative wrap."""
    h, w = shape
    label = np.zeros((h, w))
    if method == "circle":
        (ul_x, ul_y), (lr_x, lr_y) = inner_rect(center, size, yaw)
        dim_x, dim_y = lr_x - ul_x, lr_y - ul_y
        r = min(dim_x, dim_y)
        cx, cy = ul_x + dim_x / 2.0, ul_y + dim_y / 2.0
        ul_x, ul_y = cx - r / 2.0, cy - r / 2.0
        lr_x, lr_y = cx + r / 2.0, cy + r / 2.0
        rad = min((lr_y - ul_y) / 2.0, (lr_x - ul_x) / 2.0)
        pcx, pcy = project_2d(*center)
        for x in range(int(ul_x), int(lr_x)):
            for y in range(int(ul_y), int(lr_y)):
                if np.hypot(pcx - x, pcy - y) <= rad:
                    label[y, x] = 1
        return label
    rect = {"outer_rect": outer_rect, "inner_rect": inner_rect}[method]
    (ul_x, ul_y), (lr_x, lr_y) = rect(center, size, yaw)
    label[ul_y:lr_y, ul_x:lr_x] = 1
    return label


def pixel_rotation(theta, phi):
    ct, st = np.cos(theta), np.sin(theta)
    cp, sp = np.cos(phi), np.sin(phi)
    rz = np.array([[ct, -st, 0.0], [st, ct, 0.0], [0.0, 0.0, 1.0]])
    ry = np.array([[cp, 0.0, sp], [0.0, 1.0, 0.0], [-sp, 0.0, cp]])
    return rz @ ry


def encode_label(center, size, yaw, image):
    """(H, W, 26) float label; loop form, mirrors encoder.py:156-238."""
    (ulx, uly), (lrx, lry) = outer_rect(center, size, yaw)
    mask = np.zeros((H, W))
    mask[uly:lry, ulx:lrx] = 1.0
    corners = box_corners(center, size, yaw)

    reg = np.zeros((H, W, 24))
    for col in range(ulx, lrx):
        for row in range(uly, lry):
            d = image[row, col, 0]
            hgt = image[row, col, 1]
            theta = (col + X_MIN) * RES_RAD[1]
            phi = (row + Y_MIN) * RES_RAD[0]
            p = np.array([d * np.cos(theta), -d * np.sin(theta), hgt])
            rot = pixel_rotation(theta, phi)
            reg[row, col, :] = (rot.T @ (corners - p).T).T.reshape(-1)

    onehot = np.stack([1.0 - mask, mask], axis=-1)
    return np.concatenate([onehot, reg], axis=-1)


def decode_pixel_corners(reg_pixel, d, hgt, col, row):
    theta = (col + X_MIN) * RES_RAD[1]
    phi = (row + Y_MIN) * RES_RAD[0]
    p = np.array([d * np.cos(theta), -d * np.sin(theta), hgt])
    rot = pixel_rotation(theta, phi)
    return (rot @ reg_pixel.reshape(8, 3).T).T + p


# ---- decode oracle (predict.py semantics) ----
MIN_PROB = 0.5
MIN_BBOX_AREA = 100
MIN_HEAT = 2
MAX_BBX_DIST = 5.0


def find_obstacle(prob_map):
    """prob_map (H, W) -> (centroid, bbox, area) or (None, None, None)."""
    ys, xs = np.where(prob_map >= MIN_PROB)
    heat = np.zeros_like(prob_map, dtype=float)
    for y, x in zip(ys, xs):
        # python slice semantics: a negative start wraps and usually yields
        # an empty slice -> boundary positives stamp nothing
        sl_y = slice(y - 2, y + 2)
        sl_x = slice(x - 2, x + 2)
        heat[sl_y, sl_x] += 1
    heat[heat <= MIN_HEAT] = 0
    labels, n = scipy_label(heat)
    max_area = 0
    best = None
    for k in range(1, n + 1):
        yy, xx = np.where(labels == k)
        width = xx.max() - xx.min()
        height = yy.max() - yy.min()
        area = width * height
        if area > max_area:
            max_area = area
            best = ((xx.min(), yy.min()), (xx.max(), yy.max()))
    if max_area <= MIN_BBOX_AREA:
        return None, None, None
    bbox = ((best[0][0] + 2, best[0][1] + 2), (best[1][0] - 2, best[1][1] - 2))
    cx = int((bbox[0][0] + bbox[1][0]) / 2.0)
    cy = int((bbox[0][1] + bbox[1][1]) / 2.0)
    return (cx, cy), bbox, max_area


def back_project(centroid, bbox, dist_img, height_img):
    """single-frame version of predict.py:230-293."""
    cx, cy = int(centroid[0]), int(centroid[1])
    valid = (dist_img > 0) & (height_img > LIDAR_MIN_HEIGHT)
    bb = [int(b) for b in bbox]  # left, top, right, bottom
    if not valid[cy, cx] and bb[0] != 0 and bb[2] != 0:
        t, b, l, r = bb[1], bb[3] + 1, bb[0], bb[2] + 1
        yy, xx = np.mgrid[t:b, l:r]
        d2 = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
        d2 = np.where(valid[t:b, l:r], d2, 10e7)
        if d2.min() == 10e7:
            return np.zeros(4), (0, 0)
        iy, ix = np.unravel_index(np.argmin(d2), d2.shape)
        cy, cx = iy + t, ix + l
    out = np.zeros(4)
    if (cx, cy) != (0, 0):
        d = dist_img[cy, cx] + 0.75
        hgt = height_img[cy, cx]
        theta = (cx + X_MIN) * RES_RAD[1]
        out[0] = d * np.cos(theta)
        out[1] = -d * np.sin(theta)
        out[2] = hgt
    return out, (cx, cy)


def is_far(corners, centroid3d, delta=(9.0, 3.0, 3.0)):
    for c in corners:
        for k in range(3):
            if c[k] > centroid3d[k] + delta[k] or c[k] < centroid3d[k] - delta[k]:
                return True
    return False


def find_bbox_3d(dist_img, height_img, y_pred, bbox_2d, centroid_3d):
    """y_pred (H*W, 26); mirrors predict.py:94-199 including the
    membership-in-separate-lists candidate test."""
    y_pred = y_pred.reshape(H, W, 26)
    pos_rows, pos_cols = np.where(y_pred[:, :, 1] >= MIN_PROB)
    row_set, col_set = set(pos_rows.tolist()), set(pos_cols.tolist())
    (ulx, uly), (lrx, lry) = bbox_2d
    cand = []
    for col in range(ulx - 100, lrx + 100):
        for row in range(uly - 2, lry + 2):
            if col not in col_set or row not in row_set:
                continue
            c = decode_pixel_corners(
                y_pred[row, col, 2:], dist_img[row, col],
                height_img[row, col], col, row,
            )
            if not is_far(c, centroid_3d):
                cand.append(c)
    if not cand:
        return np.zeros(7), None
    cand = np.array(cand)
    flat = cand.reshape(len(cand), -1)
    dists = np.sqrt(((flat[:, None, :] - flat[None, :, :]) ** 2).sum(-1))
    counts = ((dists > 0) & (dists < MAX_BBX_DIST)).sum(axis=1)
    winners = cand[counts == counts.max()]
    box = winners.mean(axis=0)

    pred = np.zeros(7)
    pred[:3] = box.mean(axis=0)
    yaws, ls, ws, hs = [], [], [], []
    for i in range(4):
        dx = box[i, 0] - box[i + 4, 0]
        dy = box[i, 1] - box[i + 4, 1]
        yaw = np.arctan2(dy, dx)
        yaws.append(yaw)
        ls.append(abs(dx / np.cos(yaw) if yaw != np.pi / 2 else dy))
        dx2 = box[i, 0] - box[i + 2, 0]
        dy2 = box[i, 1] - box[i + 2, 1]
        ws.append(abs(dy2 / np.cos(yaw) if yaw != np.pi / 2 else dx2))
        hs.append(abs(box[i, 2] - box[i + 1, 2]))
    pred[3] = np.mean(yaws)
    pred[4] = np.mean(ls)
    pred[5] = np.mean(ws)
    pred[6] = np.mean(hs)
    return pred, box
