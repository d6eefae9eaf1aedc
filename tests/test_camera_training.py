"""Camera-source training: vs=2 FCN on grayscale frames with precomputed
footprint labels (classification only, like the reference camera path)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import yaml
from flax import nnx

from tpufusion.config import LossConfig, ModelConfig, RangeViewSpec, TrainConfig
from tpufusion.geometry.camera import CameraModel, camera_label_footprint
from tpufusion.models.fcn import FCN
from tpufusion.train.train_step import make_train_step


def _camera(tmp_path):
    cam_yaml = {
        "image_width": 201,
        "image_height": 64,
        "camera_matrix": {"data": [100, 0, 100, 0, 100, 32, 0, 0, 1]},
        "distortion_coefficients": {"data": [0, 0, 0, 0, 0]},
        "rectification_matrix": {"data": [1, 0, 0, 0, 1, 0, 0, 0, 1]},
        "projection_matrix": {"data": [100, 0, 100, 0, 0, 100, 32, 0, 0, 0, 1, 0]},
        "distortion_model": "plumb_bob",
    }
    p = tmp_path / "cam.yaml"
    p.write_text(yaml.dump(cam_yaml))
    cam = CameraModel().load_camera_calibration(str(p))
    # lidar (x fwd, y left, z up) -> camera (z fwd, x right, y down)
    cam.extrinsic = np.array(
        [
            [0.0, -1.0, 0.0, 0.0],
            [0.0, 0.0, -1.0, 0.0],
            [1.0, 0.0, 0.0, 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )
    return cam


def test_camera_training_learns(tmp_path, rng):
    cam = _camera(tmp_path)
    hw = (64, 201)
    f = 16
    images = rng.random((f, *hw, 1)).astype(np.float32)
    labels = np.zeros((f, *hw, 2), np.float32)
    for i in range(f):
        center = np.array([rng.uniform(8, 20), rng.uniform(-2, 2), -0.5])
        onehot, bbox = camera_label_footprint(
            center, np.array([4.2, 1.6, 1.5]), cam, hw, crop_top=0
        )
        labels[i] = onehot
        # paint the object into the image so there is signal to learn
        images[i, :, :, 0] += onehot[..., 1] * 2.0
    assert labels[..., 1].sum() > 0, "footprints must rasterize"

    model = FCN(
        ModelConfig(vertical_stride=2, use_regression=False),
        in_channels=1,
        rngs=nnx.Rngs(0),
    )
    optimizer = nnx.Optimizer(model, optax.adam(3e-3), wrt=nnx.Param)
    pos_frac = labels[..., 1].mean()
    loss_cfg = LossConfig(
        obj_to_bkg_ratio=pos_frac, avg_obj_size=float(labels[..., 1].sum() / f)
    )
    step = make_train_step(
        RangeViewSpec(), loss_cfg, TrainConfig(batch_size=8, augment=True),
        use_regression=False,
    )
    batch = {
        "images": jnp.asarray(images[:8]),
        "labels": jnp.asarray(labels[:8]),
    }
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(25):
        key, sub = jax.random.split(key)
        _, m = step(model, optimizer, batch, sub)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]
    assert float(m["recall"]) > 0.5
