"""Fully convolutional segmentation + corner-regression network.

Same layer geometry as the reference Keras model (`modules/lidar/train/
model.py:93-192`), rebuilt in flax.nnx:

  input (H, W, C)
    -> feature-wise BatchNorm
    -> zero-pad width (0, 3)                 # 1801 -> 1804 so /4 divides
    -> conv1  4ch 5x5 stride (vs, 4) relu    # -> W/4
    -> conv2  6ch 5x5 stride (vs, 2) relu    # -> W/8
    -> conv3 12ch 5x5 stride (vs, 2) relu    # -> W/16
    -> deconv4 16ch stride (vs, 2) relu, concat conv2
    -> heads:
       cls: deconv5a 8ch (vs,2) relu -> crop left 1 -> concat conv1
            -> deconv6a 2ch (vs,4) linear -> crop right 3
            -> softmax -> clip(eps, 1)
       reg: deconv5b/6b mirror with 24 channels, relu outputs

vs = 1 for lidar (32 rows preserved), 2 for camera.

Output: (B, H, W, 2 + 24) — classification probabilities then corner
offsets — matching the reference's concatenated output tensor
(`model.py:183`) so one loss handles both heads.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from tpufusion.config import ModelConfig

# keras kernel_initializer='random_uniform' is U(-0.05, 0.05)
def _uniform_init(scale: float = 0.05):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init


_KERAS_EPSILON = 1e-7


class SampleWiseBN(nnx.Module):
    """Per-pixel-position batch norm over the flattened image.

    The reference's USE_SAMPLE_WISE_BATCH_NORMALIZATION path reshapes to
    (B, H*W, C) and batch-normalizes axis=1 (`model.py:110-113`): one
    statistic per pixel position, shared across channels. The shipped
    lidar_model.h5 carries this flavor (57632-long normalize params).
    Inference applies stored moving statistics; training uses batch stats
    over the batch and channel axes like Keras.
    """

    def __init__(self, num_positions: int, epsilon: float = 1e-3,
                 momentum: float = 0.99):
        self.epsilon = epsilon
        self.momentum = momentum
        self.scale = nnx.Param(jnp.ones((num_positions,), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((num_positions,), jnp.float32))
        self.mean = nnx.BatchStat(jnp.zeros((num_positions,), jnp.float32))
        self.var = nnx.BatchStat(jnp.ones((num_positions,), jnp.float32))

    def __call__(self, x: jax.Array, *, use_running_average: bool = True):
        b, h, w, c = x.shape
        flat = x.reshape(b, h * w, c)
        if use_running_average:
            mean, var = self.mean[...], self.var[...]
        else:
            mean = jnp.mean(flat, axis=(0, 2))
            var = jnp.var(flat, axis=(0, 2))
            m = self.momentum
            self.mean[...] = m * self.mean[...] + (1 - m) * mean
            self.var[...] = m * self.var[...] + (1 - m) * var
        y = (flat - mean[None, :, None]) * jax.lax.rsqrt(
            var[None, :, None] + self.epsilon
        )
        y = y * self.scale[...][None, :, None] + self.bias[...][None, :, None]
        return y.reshape(b, h, w, c)


class FCN(nnx.Module):
    def __init__(
        self,
        cfg: ModelConfig,
        in_channels: int = 3,
        image_hw: tuple[int, int] | None = None,
        *,
        rngs: nnx.Rngs,
    ):
        self.cfg = cfg
        vs = cfg.vertical_stride
        kinit = _uniform_init()
        dtype = jnp.dtype(cfg.dtype)

        def conv(cin, cout, strides):
            return nnx.Conv(
                cin, cout, (5, 5), strides=strides, padding="SAME",
                kernel_init=kinit, dtype=dtype, param_dtype=jnp.float32,
                rngs=rngs,
            )

        def deconv(cin, cout, strides):
            return nnx.ConvTranspose(
                cin, cout, (5, 5), strides=strides, padding="SAME",
                kernel_init=kinit, dtype=dtype, param_dtype=jnp.float32,
                rngs=rngs,
            )

        if cfg.sample_wise_bn:
            assert image_hw is not None, "sample_wise_bn needs image_hw"
            self.norm = SampleWiseBN(image_hw[0] * image_hw[1])
        elif cfg.batch_norm:
            self.norm = nnx.BatchNorm(
                in_channels, momentum=0.99, epsilon=1e-3, rngs=rngs
            )
        wm = cfg.width_multiplier
        self.conv1 = conv(in_channels, 4 * wm, (vs, 4))
        self.conv2 = conv(4 * wm, 6 * wm, (vs, 2))
        self.conv3 = conv(6 * wm, 12 * wm, (vs, 2))
        self.deconv4 = deconv(12 * wm, 16 * wm, (vs, 2))
        self.deconv5a = deconv(22 * wm, 8 * wm, (vs, 2))
        self.deconv6a = deconv(12 * wm, 2, (vs, 4))
        if cfg.use_regression:
            nreg = self.num_reg_channels
            self.deconv5b = deconv(22 * wm, nreg, (vs, 2))
            self.deconv6b = deconv(4 * wm + nreg, nreg, (vs, 4))

    @property
    def num_reg_channels(self) -> int:
        from tpufusion.geometry.encoding import (
            DIRECT_CHANNELS,
            DIRECT_CHANNELS_DUAL,
        )

        if self.cfg.head == "corner":
            return self.cfg.num_corner_outputs
        if self.cfg.yaw_codec == "dual":
            return DIRECT_CHANNELS_DUAL
        return DIRECT_CHANNELS

    def _trunk(self, x: jax.Array, train: bool):
        """Shared encoder + deconv6a head; crops are derived from the input
        width so both the lidar (1801 -> crop 3) and camera (1368 -> crop 4)
        geometries come out right, like the per-source Cropping2D choices at
        model.py:132-141."""
        cfg = self.cfg
        w = x.shape[2]
        if cfg.batch_norm or cfg.sample_wise_bn:
            x = self.norm(x, use_running_average=not train)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 3), (0, 0)))

        c1 = nnx.relu(self.conv1(x))
        c2 = nnx.relu(self.conv2(c1))
        c3 = nnx.relu(self.conv3(c2))
        d4 = nnx.relu(self.deconv4(c3))
        cat4 = jnp.concatenate([c2, d4], axis=-1)

        crop5 = 2 * c2.shape[2] - c1.shape[2]  # 1 when conv1 width is odd
        crop6 = 4 * c1.shape[2] - w  # 3 for lidar, 4 for camera

        del crop6  # documented above; slicing to w performs the right crop
        d5a = nnx.relu(self.deconv5a(cat4))[:, :, crop5:, :]
        cat5a = jnp.concatenate([c1, d5a], axis=-1)
        d6a = self.deconv6a(cat5a)[:, :, :w, :]
        return d6a, (c1, cat4, crop5, w)

    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        cfg = self.cfg
        d6a, (c1, cat4, crop5, w) = self._trunk(x, train)
        probs = jax.nn.softmax(d6a.astype(jnp.float32), axis=-1)
        probs = jnp.clip(probs, _KERAS_EPSILON, 1.0)

        if not cfg.use_regression:
            return probs

        d5b = nnx.relu(self.deconv5b(cat4))[:, :, crop5:, :]
        cat5b = jnp.concatenate([c1, d5b], axis=-1)
        d6b = self.deconv6b(cat5b)[:, :, :w, :]
        if cfg.head == "corner" and cfg.reg_output_activation == "relu":
            d6b = nnx.relu(d6b)  # reference-compat; see ModelConfig
            # ("direct" targets are signed — always linear)
        return jnp.concatenate([probs, d6b.astype(jnp.float32)], axis=-1)

    def features(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        """Pre-softmax deconv6a feature map, the tap the fusion net consumes
        (`modules/lidar/train/train_fcn.py:371-395`)."""
        d6a, _ = self._trunk(x, train)
        return d6a
