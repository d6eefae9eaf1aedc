"""Device-mesh and sharding helpers.

The reference has no distributed execution at all (SURVEY.md §2.2); here
multi-chip scale-out is first-class: a 1-D `jax.sharding.Mesh` over the data
axis, batch tensors sharded along it, parameters replicated, and XLA inserts
the psum for gradient reduction when the jitted train step closes over the
shardings. No NCCL analog is needed — collectives ride ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpufusion.config import MeshConfig


def make_mesh(cfg: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = cfg.n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), axis_names=(cfg.data_axis,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    s = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
