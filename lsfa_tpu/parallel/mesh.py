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


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> Mesh:
    """Multi-host bring-up: join the jax.distributed cluster and return the
    GLOBAL single-axis mesh over every chip in the slice.

    The reference has no multi-node story at all (kvstore 'dist_sync' is
    plumbed but never configured — core/module.py:476-477); here the same
    sharded train/eval programs scale across hosts unchanged: batch/lane
    axes shard over the global mesh, XLA routes the all-reduce over ICI
    within a slice and DCN between slices.

    On TPU pods the arguments are discovered from the environment
    (jax.distributed.initialize() with no args); pass them explicitly for
    CPU/GPU clusters. Single-process callers can skip straight to
    make_mesh().
    """
    if coordinator is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return make_mesh()


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
