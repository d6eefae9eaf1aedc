"""Class-balanced weighted loss with population statistics.

Semantics of `custom_weighted_loss` (`modules/lidar/train/model.py:26-91`):
per-pixel negative log likelihood where background pixels are scaled by
obj_to_bkg_ratio (W1) and foreground pixels by avg_obj_size / frame_fg_area
(W2), all scaled by 1000; the regression head adds a W2-weighted L2 term
scaled by weight_bb. The reference computes `tf.norm` over the entire batch
diff — a single scalar (`model.py:77-80`); we default to the per-pixel norm
(the evident intent) and expose `reference_compat` to reproduce the quirk.

Inputs are (B, H, W, 2+24) or (B, P, 2+24); the loss is the mean over all
batch x pixel elements (keras reduces losses to a scalar mean).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpufusion.config import LossConfig


def weighted_pose_loss(
    y_pred: jax.Array,
    y_true: jax.Array,
    cfg: LossConfig = LossConfig(),
    use_regression: bool = True,
) -> jax.Array:
    if y_pred.ndim == 4:
        b = y_pred.shape[0]
        y_pred = y_pred.reshape(b, -1, y_pred.shape[-1])
        y_true = y_true.reshape(b, -1, y_true.shape[-1])
    max_pixels = y_true.shape[1]

    obj_t = y_true[..., :2]
    obj_p = y_pred[..., :2]

    nll = obj_t * (-jnp.log(obj_p))  # (B, P, 2)

    bkg_t = obj_t[..., 0:1]
    frg_t = obj_t[..., 1:2]
    frg_area = jnp.sum(frg_t, axis=1, keepdims=True)  # (B, 1, 1)
    frg_area = jnp.clip(frg_area, cfg.epsilon, float(max_pixels))

    w1 = cfg.obj_to_bkg_ratio * bkg_t if cfg.use_w1 else bkg_t
    w2_scale = cfg.avg_obj_size / frg_area
    w2 = frg_t * w2_scale if cfg.use_w2 else frg_t
    weights = w1 + w2  # (B, P, 1)

    pixel_loss = jnp.sum(weights * nll, axis=-1) * cfg.loss_scaler  # (B, P)
    loss = pixel_loss

    if use_regression:
        diff = y_true[..., 2:] - y_pred[..., 2:]
        if cfg.reg_channel_weights is not None:
            cw = jnp.asarray(cfg.reg_channel_weights, diff.dtype)
            if cw.shape[0] != diff.shape[-1]:
                raise ValueError(
                    f"reg_channel_weights has {cw.shape[0]} entries for "
                    f"{diff.shape[-1]} regression channels"
                )
            diff = diff * cw
        w2r = w2
        if cfg.reg_target_norm_clip is not None:
            # supervise only pixels whose target is well-defined (surface
            # pixels); rect pixels hitting distant clutter carry huge
            # targets — see LossConfig.reg_target_norm_clip. Zero their
            # diffs too, so the reference_compat batch-scalar norm below
            # cannot reintroduce them.
            tnorm = jnp.sqrt(
                jnp.sum(y_true[..., 2:] ** 2, axis=-1, keepdims=True)
            )
            keep = tnorm <= cfg.reg_target_norm_clip
            w2r = w2 * keep
            diff = diff * keep
        # Gradient-safe L2: sqrt has an infinite gradient at exactly 0, and
        # pixels with an exactly-zero diff (e.g. relu head emitting 0 on
        # zero-target background) turn `0-weight * inf-grad` into NaN.
        # Substituting 1 under the sqrt where the sum is 0 keeps the forward
        # value identical and makes the subgradient 0 there.
        def _safe_norm(sq):
            nonzero = sq > 0
            return jnp.sqrt(jnp.where(nonzero, sq, 1.0)) * nonzero

        if cfg.reference_compat:
            # scalar Frobenius norm over the whole batch (reference quirk)
            norm = _safe_norm(jnp.sum(diff * diff))
            reg_loss = jnp.sum(w2r * norm, axis=-1)  # (B, P)
        else:
            norm = _safe_norm(jnp.sum(diff * diff, axis=-1, keepdims=True))
            reg_loss = jnp.sum(w2r * norm, axis=-1)
        loss = loss + cfg.weight_bb * reg_loss

    return jnp.mean(loss)
