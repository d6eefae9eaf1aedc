"""Camera + lidar + radar late-fusion pose regressor.

Rebuilds the fusion net of `modules/lidar/train/train_fcn.py:258-315`
(which is drift-broken in the reference — it imports symbols and calls
signatures that no longer exist, train_fcn.py:17,362-405; fixed here):

  * per-branch: the FCN's pre-softmax deconv6a feature map (camera branch
    max-pooled (4, 1) first) -> flatten -> dropout 0.2 -> dense 96 relu ->
    dense 48 relu
  * concat(cam48, lidar48, radar[range, angle])
  * two 2-path elu heads -> centroid (3) and yaw rz (1)
  * MSE loss; sub-network freezing supported via parameter filters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from tpufusion.config import CameraConfig, ModelConfig
from tpufusion.models.fcn import FCN, _uniform_init


class _Branch(nnx.Module):
    def __init__(self, in_features: int, *, rngs: nnx.Rngs):
        kinit = _uniform_init()
        self.dropout1 = nnx.Dropout(0.2, rngs=rngs)
        self.dense1 = nnx.Linear(in_features, 96, kernel_init=kinit, rngs=rngs)
        self.dropout2 = nnx.Dropout(0.2, rngs=rngs)
        self.dense2 = nnx.Linear(96, 48, kernel_init=kinit, rngs=rngs)

    def __call__(self, x, *, train: bool):
        x = x.reshape(x.shape[0], -1)
        x = self.dropout1(x, deterministic=not train)
        x = nnx.relu(self.dense1(x))
        x = self.dropout2(x, deterministic=not train)
        return nnx.relu(self.dense2(x))


class _TwoPathHead(nnx.Module):
    def __init__(self, in_features: int, out: int, *, rngs: nnx.Rngs):
        kinit = _uniform_init()
        self.a = nnx.Linear(in_features, out, kernel_init=kinit, rngs=rngs)
        self.b = nnx.Linear(in_features, out, kernel_init=kinit, rngs=rngs)
        self.out = nnx.Linear(2 * out, out, rngs=rngs)

    def __call__(self, x):
        return self.out(
            jnp.concatenate([nnx.elu(self.a(x)), nnx.elu(self.b(x))], axis=-1)
        )


class FusionNet(nnx.Module):
    def __init__(
        self,
        lidar_model: ModelConfig = ModelConfig(),
        camera_model: ModelConfig = ModelConfig(
            vertical_stride=2, use_regression=False
        ),
        camera: CameraConfig = CameraConfig(),
        lidar_hw: tuple[int, int] = (32, 1801),
        lidar_pool: tuple[int, int] | None = None,
        cam_pool: tuple[int, int] = (4, 1),
        *,
        rngs: nnx.Rngs,
    ):
        """lidar_pool / cam_pool: (ph, pw) max-pools over the branch
        feature maps before their dense layers. The reference pools the
        camera (4, 1) and flattens the raw 32x1801x2 lidar map into an
        ~11M-parameter Dense (train_fcn.py:258-272 — a net it never
        shipped weights for); lidar_pool (2, 8) + cam_pool (8, 8) cut the
        branches to ~2.8M params total so a trained full-camera-scale
        fusion asset is small enough to ship in-repo. The defaults keep
        the reference-faithful geometry."""
        self.lidar_fcn = FCN(lidar_model, in_channels=3, rngs=rngs)
        self.camera_fcn = FCN(camera_model, in_channels=camera.channels, rngs=rngs)
        self.lidar_pool = lidar_pool
        self.cam_pool = cam_pool
        cam_flat = (
            (camera.height // cam_pool[0]) * (camera.width // cam_pool[1]) * 2
        )
        lh, lw = lidar_hw
        if lidar_pool is not None:
            lh, lw = lh // lidar_pool[0], lw // lidar_pool[1]
        lidar_flat = lh * lw * 2
        self.cam_branch = _Branch(cam_flat, rngs=rngs)
        self.lidar_branch = _Branch(lidar_flat, rngs=rngs)
        self.centroid_head = _TwoPathHead(48 + 48 + 4, 3, rngs=rngs)
        self.rz_head = _TwoPathHead(48 + 48 + 4, 1, rngs=rngs)

    def __call__(self, cam_img, lidar_img, radar, *, train: bool = False):
        """cam_img (B,Hc,Wc,1), lidar_img (B,32,1801,3), radar (B,2)
        -> (centroid (B,3), rz (B,1))."""
        cam_feat = self.camera_fcn.features(cam_img, train=train)
        lidar_feat = self.lidar_fcn.features(lidar_img, train=train)
        cam_feat = nnx.max_pool(
            cam_feat, window_shape=self.cam_pool, strides=self.cam_pool,
            padding="VALID",
        )
        if self.lidar_pool is not None:
            lidar_feat = nnx.max_pool(
                lidar_feat, window_shape=self.lidar_pool,
                strides=self.lidar_pool, padding="VALID",
            )
        c = self.cam_branch(cam_feat, train=train)
        l = self.lidar_branch(lidar_feat, train=train)
        # radar reaches the heads in BOTH frames: the reference fed raw
        # (range, angle) only (train_fcn.py:300-307), forcing the tiny elu
        # heads to learn the polar->cartesian transform the target lives
        # in; deriving r*cos(a), r*sin(a) here makes the radar->centroid
        # mapping near-linear (framework extension, A/B'd in BASELINE.md)
        radar = radar.astype(jnp.float32)
        r, a = radar[..., 0:1], radar[..., 1:2]
        radar_feats = jnp.concatenate(
            [r, a, r * jnp.cos(a), r * jnp.sin(a)], axis=-1
        )
        x = jnp.concatenate([c, l, radar_feats], axis=-1)
        return self.centroid_head(x), self.rz_head(x)


def fusion_loss(outputs, targets) -> jax.Array:
    """MSE over both heads (train_fcn.py:309-310)."""
    centroid, rz = outputs
    t_centroid, t_rz = targets
    return jnp.mean((centroid - t_centroid) ** 2) + jnp.mean((rz - t_rz) ** 2)


def trainable_filter(lock_lidar: bool = False, lock_camera: bool = False):
    """nnx filter selecting the trainable params; mirrors the layer freezing
    by name in train_fcn.py:303-307."""

    def predicate(path, value) -> bool:
        if not isinstance(value, nnx.Param):
            return False
        if lock_lidar and path and path[0] == "lidar_fcn":
            return False
        if lock_camera and path and path[0] == "camera_fcn":
            return False
        return True

    return predicate
