"""jit-compiled train / eval steps.

Everything that the reference did on the host per batch — unpickling,
python label encoding (`loader.py:243-253` -> `encoder.py:156-238`),
augmentation (`loader.py:31-57`) — happens on device inside one XLA
program here: (optional) point projection, label encoding, azimuth-roll
augmentation, forward, loss, backward, optimizer update, metrics.

Batches are dicts with either precomputed range-view `images` (B, H, W, 3)
or raw `points` (B, N, 4) to be projected on device, plus ground truth
`center` (B, 3), `size` (B, 3), `yaw` (B,).
"""

from __future__ import annotations

from flax import nnx

from tpufusion.config import LossConfig, RangeViewSpec, TrainConfig
from tpufusion.data.augment import augment_batch
from tpufusion.geometry.encoding import encode_label_batch
from tpufusion.geometry.range_view import range_view_project_batch
from tpufusion.models.losses import weighted_pose_loss
from tpufusion.models.metrics import batch_metrics


def _batch_images(batch, spec: RangeViewSpec):
    if "images" in batch:
        return batch["images"]
    # optional per-point validity (beam-structured scans mark no-return
    # rays invalid; the projector drops them like padding)
    return range_view_project_batch(
        batch["points"], spec, batch.get("valid")
    )


def make_train_step(
    spec: RangeViewSpec,
    loss_cfg: LossConfig,
    train_cfg: TrainConfig,
    use_regression: bool = True,
    mesh=None,
    head: str = "corner",
    yaw_frame: str = "local",
):
    """Returns train_step(model, optimizer, batch, key) -> (loss, metrics).

    With a 2-D (data, spatial) `mesh`, the range image and labels are
    pinned to the data x spatial layout after projection/encode, so GSPMD
    spatially partitions the FCN convolutions (halo exchanges at shard
    edges) instead of gathering full images per chip.

    yaw_frame selects the direct head's sin/cos codec
    (geometry/encoding.encode_direct_label): "local" for oriented
    surfaces (the arc's ray-relative orientation is the locally visible
    quantity), "global" for rotationally symmetric surfaces, where the
    local target is pure position information a translation-equivariant
    trunk cannot represent (tools/train_synthetic_detector resolves this
    per scene family; decode must use the matching
    DecodeConfig.direct_yaw_frame).

    head="direct" encodes the 8-channel direct-pose targets instead of
    the 24-dim corner field; the azimuth-roll augmentation is skipped for
    it (the sin/cos yaw channels are not roll-invariant — see
    geometry/encoding.encode_direct_label).
    """

    @nnx.jit
    def train_step(model, optimizer, batch, key):
        images = _batch_images(batch, spec)
        if "labels" in batch:
            # precomputed labels (camera-source training: footprints from
            # geometry/camera.camera_label_footprint, no on-device encode)
            labels = batch["labels"]
        elif head == "direct":
            from tpufusion.geometry.encoding import encode_direct_label_batch

            labels = encode_direct_label_batch(
                batch["center"], batch["size"], batch["yaw"], images, spec,
                yaw_frame=yaw_frame,
            )
        else:
            labels = encode_label_batch(
                batch["center"], batch["size"], batch["yaw"], images, spec
            )
        if train_cfg.augment and "labels" not in batch and head != "direct":
            images, labels = augment_batch(
                key, images, labels,
                batch["center"], batch["size"], batch["yaw"], spec,
            )
        if mesh is not None:
            from tpufusion.parallel.mesh import constrain_spatial

            images = constrain_spatial(images, mesh)
            labels = constrain_spatial(labels, mesh)

        def loss_fn(model):
            preds = model(images, train=True)
            loss = weighted_pose_loss(preds, labels, loss_cfg, use_regression)
            return loss, preds

        (loss, preds), grads = nnx.value_and_grad(loss_fn, has_aux=True)(model)
        optimizer.update(model, grads)
        metrics = batch_metrics(preds, labels, use_regression)
        metrics["loss"] = loss
        return loss, metrics

    return train_step


def make_eval_step(
    spec: RangeViewSpec,
    loss_cfg: LossConfig,
    use_regression: bool = True,
    head: str = "corner",
    yaw_frame: str = "local",
):
    """Eval twin of make_train_step; yaw_frame must match the codec the
    model was trained with (see make_train_step's docstring)."""
    @nnx.jit
    def eval_step(model, batch):
        images = _batch_images(batch, spec)
        if "labels" in batch:
            labels = batch["labels"]
        elif head == "direct":
            from tpufusion.geometry.encoding import encode_direct_label_batch

            labels = encode_direct_label_batch(
                batch["center"], batch["size"], batch["yaw"], images, spec,
                yaw_frame=yaw_frame,
            )
        else:
            labels = encode_label_batch(
                batch["center"], batch["size"], batch["yaw"], images, spec
            )
        preds = model(images, train=False)
        loss = weighted_pose_loss(preds, labels, loss_cfg, use_regression)
        metrics = batch_metrics(preds, labels, use_regression)
        metrics["loss"] = loss
        return loss, metrics

    return eval_step


def make_forward(spec: RangeViewSpec):
    """Inference forward: points -> (images, predictions), one XLA program.

    This is the projection+FCN part of the benchmarked end-to-end graph.
    """

    @nnx.jit
    def forward(model, points):
        images = range_view_project_batch(points, spec)
        preds = model(images, train=False)
        return images, preds

    return forward
