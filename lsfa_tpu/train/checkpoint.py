"""Checkpoint save/load/resume (orbax) + pretrained-weight import.

Behavioral targets:
  * per-epoch checkpointing with optimizer state
    (train_end2end.py:148, core/module.py:148-168);
  * resume via TRAIN.RESUME -> load params + optimizer state
    (train_end2end.py:107-110,129-130);
  * the reference's bbox-std "baking" into duplicated *_test params
    (core/callback.py:54-65) is intentionally NOT replicated — decoding
    applies BBOX_STDS explicitly at inference (eval/detector.py), which is
    equivalent and keeps one set of weights;
  * init_weight's small-net seeding: copy backbone stage-1/stem params
    into the small_net trunk (resnet_v1_101_flownet_rfcn.py:753-760);
  * pretrained backbone import from a torchvision-format ResNet state
    dict (replaces the MXNet .params reader + combine_model).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


def _mgr(path: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(os.path.abspath(path))


def save_checkpoint(path: str, epoch: int, params, batch_stats, opt_state):
    """Write <path>/<epoch>/ with params + stats + optimizer state."""
    with _mgr(path) as mgr:
        mgr.save(epoch, args=ocp.args.StandardSave({
            "params": params,
            "batch_stats": batch_stats,
            "opt_state": opt_state,
        }))
        mgr.wait_until_finished()


def latest_step(path: str) -> int | None:
    """Latest saved epoch under `path`, or None when nothing is saved."""
    if not os.path.isdir(path):
        return None
    with _mgr(path) as mgr:
        return mgr.latest_step()


def load_checkpoint(path: str, epoch: int | None = None, template=None):
    """Load a checkpoint (latest when epoch is None). Returns the dict."""
    with _mgr(path) as mgr:
        step = epoch if epoch is not None else mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {path}")
        if template is not None:
            return mgr.restore(step, args=ocp.args.StandardRestore(template)), step
        return mgr.restore(step), step


def seed_small_net(params):
    """Copy the main backbone's stem + stage-1 params into the small-net
    trunk (the reference initializes small_net_* from the backbone)."""
    if "small_net_backbone" not in params:
        return params
    params = jax.tree.map(lambda x: x, params)  # shallow copy tree
    src = params["backbone"]
    dst = params["small_net_backbone"]

    def copy_matching(d, s):
        for k in d:
            if k in s:
                if isinstance(d[k], dict):
                    copy_matching(d[k], s[k])
                elif d[k].shape == s[k].shape:
                    # materialize a copy: aliasing the same buffer in two
                    # tree slots breaks donation (donate same buffer twice)
                    d[k] = jnp.array(s[k])
        return d

    params["small_net_backbone"] = copy_matching(dict(dst), src)
    return params


def combine_checkpoints(params, sources: dict[str, dict]):
    """Merge pretrained subtrees into a fresh param tree (the role of
    lib/utils/combine_model.py — ResNet + FlowNet merged into one init).

    sources: {top_level_module_name: param_subtree}. Leaves are copied
    where the paths and shapes match; returns (params, n_copied)."""
    params = jax.tree.map(lambda x: x, params)
    copied = 0

    def merge(dst, src):
        nonlocal copied
        for k, v in src.items():
            if k not in dst:
                continue
            if isinstance(v, dict) and isinstance(dst[k], dict):
                dst[k] = dict(dst[k])
                merge(dst[k], v)
            elif hasattr(v, "shape") and tuple(v.shape) == tuple(dst[k].shape):
                dst[k] = v
                copied += 1
        return dst

    for top, sub in sources.items():
        if top in params:
            params[top] = merge(dict(params[top]), sub)
    return params, copied


def import_torch_resnet(params, batch_stats, state_dict: dict[str, Any],
                        prefix: str = "backbone"):
    """Map a torchvision ResNet state_dict onto the backbone param tree.

    SECONDARY warm start only — for EXACT parity with the reference's
    pretrained weights use `train.import_mxnet.import_mxnet_lsfa` (reads
    the MXNet .params format directly, including BN running stats).
    torchvision ResNets are post-activation (v1); our trunk is
    pre-activation (v2), so BN/conv pairings differ — this imports the
    conv kernels (the bulk of the capacity) positionally per unit and the
    stem exactly, leaving BN affine at init; callers should check the
    returned import count.
    """
    p = params[prefix]
    bs = batch_stats.get(prefix, {})

    def put_conv(dst_mod: dict, torch_w):
        w = np.transpose(np.asarray(torch_w), (2, 3, 1, 0))  # OIHW -> HWIO
        k = "kernel"
        if dst_mod[k].shape == w.shape:
            dst_mod[k] = w
            return True
        return False

    imported = 0
    if "conv0" in p and "conv1.weight" in state_dict:
        imported += put_conv(p["conv0"], state_dict["conv1.weight"])
    # stages: torch layer{1..4}.{i}.conv{1..3}.weight
    for s in range(1, 5):
        u = 0
        while f"stage{s}_unit{u + 1}" in p:
            unit = p[f"stage{s}_unit{u + 1}"]
            for ci in (1, 2, 3):
                tk = f"layer{s}.{u}.conv{ci}.weight"
                name = f"conv{ci}"
                if tk in state_dict and name in unit and "kernel" in unit[name]:
                    imported += put_conv(unit[name], state_dict[tk])
            tk = f"layer{s}.{u}.downsample.0.weight"
            if tk in state_dict and "sc" in unit:
                imported += put_conv(unit["sc"], state_dict[tk])
            u += 1
    del bs
    return params, imported
