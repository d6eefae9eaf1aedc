"""Fusion (camera+lidar+radar) training and inference drivers.

Covers `modules/lidar/train/train_fcn.py:317-505` and `predict_fcn.py`
(both drift-broken in the reference): triple-modality alignment via
vectorized timestamp joins, a jitted MSE train step with optional
sub-network freezing, ReduceLROnPlateau-style learning-rate decay, and a
batched inference driver emitting the centroid+rz CSV.
"""

from __future__ import annotations

import csv

import jax
import numpy as np
import optax
from flax import nnx

from tpufusion.data.align import align_camera_lidar_radar
from tpufusion.models.fusion import FusionNet, fusion_loss, trainable_filter
from tpufusion.utils.logging import get_logger

log = get_logger("fusion")


def build_fusion_batches(
    cam_images: np.ndarray,  # (Fc, Hc, Wc, 1) in camera-timestamp order
    cam_ts: np.ndarray,
    cam_poses: np.ndarray,  # (Fc, 4) tx ty tz rz at camera timestamps
    lidar_images: np.ndarray,  # (Fl, H, W, 3)
    lidar_ts: np.ndarray,
    radar_feats: np.ndarray,  # (Fr, 2) range, angle
    radar_ts: np.ndarray,
) -> dict[str, np.ndarray]:
    """One aligned sample per camera frame (train_fcn.py:178-255)."""
    idx = align_camera_lidar_radar(cam_ts, lidar_ts, radar_ts)
    return {
        "cam": cam_images,
        "lidar": lidar_images[idx["lidar_index"]],
        "radar": radar_feats[idx["radar_index"]],
        "centroid": np.asarray(cam_poses[:, :3], np.float32),
        "rz": np.asarray(cam_poses[:, 3:4], np.float32),
    }


def make_fusion_train_step():
    """Jitted step over the DEVICE-RESIDENT dataset: the batch gather by
    `rows` happens inside the jit, so each step moves only a scalar loss
    device->host and nothing host->device (a fresh staging transfer per
    step leaks on the axon relay — a 60-epoch full-camera-scale run was
    OOM-killed at 130 GB host RSS before this)."""

    @nnx.jit
    def step(net, opt, cam, lidar, radar, centroid, rz, rows):
        def loss_fn(net):
            return fusion_loss(
                net(cam[rows], lidar[rows], radar[rows], train=True),
                (centroid[rows], rz[rows]),
            )

        loss, grads = nnx.value_and_grad(loss_fn)(net)
        # reduce_on_plateau in the chain consumes the loss value
        opt.update(net, grads, value=loss)
        return loss

    return step


def make_fusion_tx(lr: float, steps_per_epoch: int):
    """adam + Keras-style ReduceLROnPlateau (train_fcn.py:442-443).

    Keras applies the plateau test once per EPOCH on the epoch's loss;
    the optax transform sees per-step batch losses, so accumulate a full
    epoch of them before comparing (accumulation_size) and wait
    patience=3 epochs. Raw per-step patience collapses the LR inside the
    first epoch on any dataset larger than a few batches (measured: a
    512-frame run froze at loss 101 by epoch 1). Note optax's patience
    and cooldown both count accumulation WINDOWS (= epochs here), not
    steps — its _update_scale runs and decrements cooldown_count once
    per accumulation_size values.
    """
    return optax.chain(
        optax.adam(lr),
        optax.contrib.reduce_on_plateau(
            patience=3, factor=0.5,
            accumulation_size=steps_per_epoch,
            cooldown=1,
        ),
    )


def train_fusion(
    net: FusionNet,
    data: dict[str, np.ndarray],
    epochs: int = 10,
    batch_size: int = 8,
    lr: float = 1e-3,
    lock_lidar: bool = False,
    lock_camera: bool = False,
    seed: int = 0,
) -> list[float]:
    wrt = nnx.Param
    if lock_lidar or lock_camera:
        wrt = trainable_filter(lock_lidar, lock_camera)
    n = len(data["cam"])
    steps_per_epoch = max(1, (max(n - batch_size, 0)) // batch_size + 1)
    tx = make_fusion_tx(lr, steps_per_epoch)
    opt = nnx.Optimizer(net, tx, wrt=wrt)
    step = make_fusion_train_step()
    rng = np.random.default_rng(seed)
    losses = []
    # stage the dataset on device ONCE and gather batches on-device: a
    # fresh host->device transfer per step leaks its staging buffer on
    # the axon relay (~22 MB/step at the full camera scale — a 60-epoch
    # run was OOM-killed at 130 GB host RSS before this)
    dev = {
        k: jax.numpy.asarray(data[k])
        for k in ("cam", "lidar", "radar", "centroid", "rz")
    }
    for epoch in range(epochs):
        order = rng.permutation(n)
        epoch_losses = []
        for lo in range(0, n - batch_size + 1, batch_size):
            rows = jax.numpy.asarray(order[lo : lo + batch_size])
            loss = step(
                net, opt, dev["cam"], dev["lidar"], dev["radar"],
                dev["centroid"], dev["rz"], rows,
            )
            epoch_losses.append(float(loss))
        mean_loss = float(np.mean(epoch_losses)) if epoch_losses else 0.0
        losses.append(mean_loss)
        log.info("fusion epoch %d loss %.5f", epoch, mean_loss)
    return losses


def predict_fusion(
    net: FusionNet,
    data: dict[str, np.ndarray],
    timestamps,
    output_csv: str,
    batch_size: int = 8,
) -> None:
    """Batched fusion inference -> centroid+rz CSV (predict_fcn.py:157-183)."""
    graphdef, state = nnx.split(net)

    @jax.jit
    def fwd(state, cam, lidar, radar):
        return nnx.merge(graphdef, state)(cam, lidar, radar, train=False)

    n = len(data["cam"])
    rows = []
    for lo in range(0, n, batch_size):
        sl = slice(lo, min(lo + batch_size, n))
        pad = batch_size - (sl.stop - sl.start)
        def pick(a):
            x = a[sl]
            if pad:
                x = np.concatenate([x, np.repeat(x[-1:], pad, 0)])
            return jax.numpy.asarray(x)
        centroid, rz = fwd(state, pick(data["cam"]), pick(data["lidar"]), pick(data["radar"]))
        centroid = np.asarray(centroid)[: sl.stop - sl.start]
        rz = np.asarray(rz)[: sl.stop - sl.start]
        for c, r in zip(centroid, rz):
            rows.append((c[0], c[1], c[2], r[0]))
    with open(output_csv, "w", newline="") as f:
        wr = csv.DictWriter(
            f, ["timestamp", "tx", "ty", "tz", "rx", "ry", "rz", "l", "w", "h"]
        )
        wr.writeheader()
        for ts, (tx, ty, tz, rz_) in zip(timestamps, rows):
            wr.writerow(
                {
                    "timestamp": ts,
                    "tx": float(tx), "ty": float(ty), "tz": float(tz),
                    "rx": 0.0, "ry": 0.0, "rz": float(rz_),
                    "l": 0.0, "w": 0.0, "h": 0.0,
                }
            )
