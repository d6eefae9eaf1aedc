"""Import the reference's shipped Keras weights into a tpufusion FCN.

The reference ships a trained classification model
(`modules/lidar/data/lidar_model.h5`, Keras 2.0.4): sample-wise BN +
conv1..3 + deconv4/5a/6a. This loader maps those weights onto our FCN so
users can run the original detector through the TPU pipeline.

Kernel conventions:
  * Conv2D: Keras (kh, kw, in, out) == flax — copied as-is.
  * Conv2DTranspose: Keras stores (kh, kw, out, in) and computes the
    GRADIENT of a strided conv; flax's ConvTranspose (transpose_kernel=
    False) computes a fractionally-strided conv with (kh, kw, in, out).
    The two agree iff the Keras kernel is spatially flipped and its
    channel axes swapped — verified against jax's own conv VJP in
    tests/test_keras_import.py.
"""

from __future__ import annotations

import h5py
import jax.numpy as jnp
import numpy as np
from flax import nnx

from tpufusion.config import ModelConfig
from tpufusion.models.fcn import FCN, SampleWiseBN


def keras_deconv_to_flax(kernel: np.ndarray) -> np.ndarray:
    """(kh, kw, out, in) gradient-conv kernel -> flax (kh, kw, in, out)."""
    return kernel[::-1, ::-1].transpose(0, 1, 3, 2).copy()


def _weights_of(f: h5py.File, layer: str) -> dict[str, np.ndarray]:
    g = f[layer]
    out = {}

    def visit(name, item):
        if isinstance(item, h5py.Dataset):
            out[name.split("/")[-1].split(":")[0]] = np.asarray(item)

    g.visititems(visit)
    return out


def load_reference_fcn(
    h5_path: str,
    image_hw: tuple[int, int] = (32, 1801),
    in_channels: int = 3,
) -> FCN:
    """Build an FCN matching the shipped architecture and load its weights."""
    with h5py.File(h5_path, "r") as f:
        layers = set()
        f.visit(lambda n: layers.add(n.split("/")[0]))
        has_reg = "deconv5b" in layers
        has_swbn = False
        if "normalize" in layers:
            norm_w = _weights_of(f, "normalize")
            has_swbn = norm_w["gamma"].size == image_hw[0] * image_hw[1]

        cfg = ModelConfig(
            use_regression=has_reg,
            batch_norm="normalize" in layers and not has_swbn,
            sample_wise_bn=has_swbn,
        )
        model = FCN(cfg, in_channels, image_hw=image_hw, rngs=nnx.Rngs(0))

        if "normalize" in layers:
            w = _weights_of(f, "normalize")
            if has_swbn:
                assert isinstance(model.norm, SampleWiseBN)
                model.norm.scale[...] = jnp.asarray(w["gamma"])
                model.norm.bias[...] = jnp.asarray(w["beta"])
                model.norm.mean[...] = jnp.asarray(w["moving_mean"])
                model.norm.var[...] = jnp.asarray(w["moving_variance"])
            else:
                model.norm.scale[...] = jnp.asarray(w["gamma"])
                model.norm.bias[...] = jnp.asarray(w["beta"])
                model.norm.mean[...] = jnp.asarray(w["moving_mean"])
                model.norm.var[...] = jnp.asarray(w["moving_variance"])

        for name in ("conv1", "conv2", "conv3"):
            w = _weights_of(f, name)
            layer = getattr(model, name)
            layer.kernel[...] = jnp.asarray(w["kernel"])
            layer.bias[...] = jnp.asarray(w["bias"])

        deconvs = ["deconv4", "deconv5a", "deconv6a"]
        if has_reg:
            deconvs += ["deconv5b", "deconv6b"]
        for name in deconvs:
            w = _weights_of(f, name)
            layer = getattr(model, name)
            layer.kernel[...] = jnp.asarray(keras_deconv_to_flax(w["kernel"]))
            layer.bias[...] = jnp.asarray(w["bias"])

    return model
