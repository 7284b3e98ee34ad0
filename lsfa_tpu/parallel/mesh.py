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


def make_tp_mesh(n_model: int, n_data: int | None = None) -> Mesh:
    """2-axis ('data', 'model') mesh for tensor-parallel demos. The model
    does not NEED TP (it fits one chip; the reference has no TP either —
    SURVEY §2.5), but the head stack shards cleanly when chips are wider
    than the batch: see tensor_parallel_specs."""
    devs = jax.devices()
    if n_data is None:
        n_data = len(devs) // n_model
    devs = np.asarray(devs[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


# Modules whose conv kernels shard over the model axis. feat_conv_3x3
# (the 1024-ch "DFF feature" producer, reference
# resnet_v1_101_flownet_rfcn.py:300-304) shards its OUTPUT channels; its
# four 1x1-conv consumers (RPN + R-FCN heads, :342-347,397-399) shard the
# matching CONTRACTING dim, so XLA keeps the feature map channel-sharded
# across the boundary and inserts one psum after the heads.
_TP_OUT_MODULES = ("feat_conv_3x3",)
_TP_IN_MODULES = ("rpn_cls_score", "rpn_bbox_pred", "rfcn_cls", "rfcn_bbox")


def tensor_parallel_specs(variables, axis: str = "model"):
    """PartitionSpec pytree (matching `variables`) that shards the LSFA /
    RFCN head stack over `axis` and replicates everything else.

    The channel split feeding the heads (models/lsfa.py::_split, the
    reference's SliceChannel at :338-341) lands on a shard boundary for
    any axis size dividing feat_dim/2, so no resharding happens between
    feat_conv_3x3 and the heads."""
    from jax.tree_util import DictKey, tree_map_with_path

    def spec(path, x):
        names = [k.key for k in path if isinstance(k, DictKey)]
        leaf = names[-1] if names else ""
        mod = names[-2] if len(names) >= 2 else ""
        if mod in _TP_OUT_MODULES:
            if leaf == "kernel" and x.ndim == 4:
                return P(None, None, None, axis)
            if leaf == "bias" and x.ndim == 1:
                return P(axis)
        if mod in _TP_IN_MODULES and leaf == "kernel" and x.ndim == 4:
            return P(None, None, axis, None)
        return P()

    return tree_map_with_path(spec, variables)


def shard_params(mesh: Mesh, variables, specs):
    """Place a variables pytree per a PartitionSpec pytree."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        variables, specs)


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
