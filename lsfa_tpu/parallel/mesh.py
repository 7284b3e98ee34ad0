"""Device mesh + sharding helpers.

This replaces the ENTIRE distributed layer of the reference — the
DataParallelExecutorGroup batch scatter (dff_rfcn/core/DataParallelExecutorGroup.py:193-360)
and the kvstore gradient reduce (core/module.py:449-584) — with
jax.sharding: batches are sharded over the 'data' mesh axis, parameters
replicated, and XLA emits the gradient all-reduce over ICI from the jitted
train step. Multi-host extends the same mesh over DCN via
jax.distributed.initialize (no code change here).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Place a host batch with the leading dim sharded over the mesh."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def batch_sharding(mesh: Mesh, axis: str = "data"):
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh):
    return NamedSharding(mesh, P())
