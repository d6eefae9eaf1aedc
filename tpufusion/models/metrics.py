"""Batch-wise precision / recall / regression-MSE metrics.

Mirrors `custom_precision` / `custom_recall` / `custom_mse`
(`modules/lidar/train/train.py:24-79`): foreground channel is index 1,
predictions are rounded, and epsilon guards the divisions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-7


def batch_metrics(
    y_pred: jax.Array, y_true: jax.Array, use_regression: bool = True
) -> dict[str, jax.Array]:
    frg_t = y_true[..., 1]
    frg_p = y_pred[..., 1]

    tp = jnp.sum(jnp.round(jnp.clip(frg_t * frg_p, 0, 1)))
    pred_pos = jnp.sum(jnp.round(jnp.clip(frg_p, 0, 1)))
    poss_pos = jnp.sum(jnp.round(jnp.clip(frg_t, 0, 1)))

    out = {
        "precision": tp / (pred_pos + _EPS),
        "recall": tp / (poss_pos + _EPS),
    }
    if use_regression:
        diff = y_true[..., 2:] - y_pred[..., 2:]
        out["reg_mse"] = jnp.mean(diff * diff)
    return out
