"""Lightweight portable weight export/import (single .npz file).

Complements the orbax CheckpointManager (directory-based, training
resume) with a flat single-file format for shipping small trained models
as fixtures/assets — the counterpart of the reference's shipped
`modules/lidar/data/lidar_model.h5` artifact.

Keys are '/'-joined nnx state paths; every leaf (params and batch stats)
is stored, so a restored model is inference-identical.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import nnx


def save_state_npz(path: str, model: nnx.Module) -> None:
    flat = nnx.state(model).flat_state()
    arrays = {"/".join(map(str, k)): np.asarray(v[...]) for k, v in flat}
    np.savez_compressed(path, **arrays)


def load_state_npz(path: str, model: nnx.Module) -> None:
    """Loads weights saved by save_state_npz into `model` in place.
    The model must have the same architecture (state tree)."""
    z = np.load(path)
    state = nnx.state(model)
    flat = state.flat_state()
    keys = {"/".join(map(str, k)) for k, _ in flat}
    missing = keys.symmetric_difference(z.files)
    if missing:
        raise ValueError(f"state/file key mismatch: {sorted(missing)[:6]}")
    for k, v in flat:
        key = "/".join(map(str, k))
        v[...] = jnp.asarray(z[key], dtype=v[...].dtype)
    nnx.update(model, state)
