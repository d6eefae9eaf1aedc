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


def _learned_state(model: nnx.Module):
    """Params + batch stats — the learned leaves. RNG state (e.g. dropout
    keys) is deliberately excluded: PRNGKey arrays don't serialize to npz
    and carry no trained information."""
    return nnx.state(model, nnx.Any(nnx.Param, nnx.BatchStat))


def save_state_npz(path: str, model: nnx.Module, dtype=None) -> None:
    """dtype (e.g. np.float16) downcasts stored arrays — load_state_npz
    casts back to the model dtype, so a float16 export halves asset size
    at ~1e-3 relative weight error (fine for shipped regressor assets)."""
    flat = _learned_state(model).flat_state()
    arrays = {"/".join(map(str, k)): np.asarray(v[...]) for k, v in flat}
    if dtype is not None:
        arrays = {
            k: v.astype(dtype) if np.issubdtype(v.dtype, np.floating) else v
            for k, v in arrays.items()
        }
    np.savez_compressed(path, **arrays)


def load_state_npz(path: str, model: nnx.Module) -> None:
    """Loads weights saved by save_state_npz into `model` in place.
    The model must have the same architecture (state tree)."""
    z = np.load(path)
    state = _learned_state(model)
    flat = state.flat_state()
    keys = {"/".join(map(str, k)) for k, _ in flat}
    missing = keys.symmetric_difference(z.files)
    if missing:
        raise ValueError(f"state/file key mismatch: {sorted(missing)[:6]}")
    for k, v in flat:
        key = "/".join(map(str, k))
        v[...] = jnp.asarray(z[key], dtype=v[...].dtype)
    nnx.update(model, state)
