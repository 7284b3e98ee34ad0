"""End-to-end training driver — the train_net equivalent.

Behavioral target: dff_rfcn/train_end2end.py:58-173 — build model, load
DET+VID roidb, construct the loader, pretrained init, optimizer with the
warmup multifactor schedule, epoch loop with Speedometer + per-epoch
checkpoints, resume support.

TPU redesign: MutableModule/DataParallelExecutorGroup/kvstore are replaced
by one jitted data-parallel train step over a Mesh (train_step.py); the
epoch loop is a thin host loop that feeds prefetched fixed-shape batches.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from lsfa_tpu.data.dataset import (
    ImageNetVID,
    append_flipped,
    filter_roidb,
    merge_roidb,
)
from lsfa_tpu.data.loader import TrainLoader
from lsfa_tpu.models.lsfa import lsfa_from_config
from lsfa_tpu.parallel import make_mesh
from lsfa_tpu.train.checkpoint import (
    combine_checkpoints, load_checkpoint, save_checkpoint, seed_small_net)
from lsfa_tpu.train.import_mxnet import import_mxnet_lsfa
from lsfa_tpu.train.schedule import make_optimizer
from lsfa_tpu.train.train_step import (
    TrainSettings,
    make_rfcn_train_step,
    make_train_step,
)
from lsfa_tpu.utils import Speedometer, create_logger


def load_train_roidb(cfg):
    """DET+VID merged roidb with flip augmentation
    (train_end2end.py:76-81)."""
    sets = cfg.dataset.image_set.split("+")
    roidbs = []
    for s in sets:
        ds = ImageNetVID(s, cfg.dataset.root_path, cfg.dataset.dataset_path)
        r = ds.gt_roidb()
        for rec in r:
            if "pattern" in rec:
                rec["video_path"] = ds.video_path(
                    {"path": os.path.relpath(
                        os.path.dirname(rec["image"]),
                        os.path.join(cfg.dataset.dataset_path, "Data", "VID"))})
        if cfg.TRAIN.FLIP:
            r = append_flipped(r)
        roidbs.append(r)
    return filter_roidb(merge_roidb(roidbs))


def is_rfcn(cfg) -> bool:
    """Single-frame baseline configs (the reference's rfcn/ package) are
    selected by the symbol name, mirroring the per-package experiment
    launchers (experiments/rfcn/... vs experiments/dff_rfcn/...)."""
    return str(cfg.symbol).startswith("rfcn")


def init_model(cfg, rng_seed: int = 0, logger=None):
    """Init the model variables at the configured bucket, then apply the
    pretrained init: MXNet .params backbone + flownet (the reference's
    load_param + combine semantics, train_end2end.py:107-115) when
    cfg.network.pretrained / pretrained_flow point at files, followed by
    init_weight's small-net seeding (:753-760)."""
    h, w = cfg.tpu.default_bucket
    fh, fw = h // 16, w // 16
    rng = jax.random.PRNGKey(rng_seed)
    data = jnp.zeros((1, h, w, 3), jnp.float32)
    if is_rfcn(cfg):
        from lsfa_tpu.eval.rfcn_tester import rfcn_from_config
        model = rfcn_from_config(cfg)
        variables = model.init(rng, data, False)
    else:
        model = lsfa_from_config(cfg)
        mv = jnp.zeros((1, fh, fw, 2), jnp.float32)
        res = jnp.zeros((1, fh, fw, 3), jnp.float32)
        variables = model.init(rng, data, data, data, jnp.ones((1,)),
                               jnp.ones((1,)), mv, res)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}

    sources = []
    for key in ("pretrained", "pretrained_flow"):
        name = str(getattr(cfg.network, key, "") or "")
        if not name:
            continue
        if key == "pretrained_flow" and os.path.isdir(name):
            # an orbax checkpoint dir (tools/pretrain_flow.py output): the
            # in-env stand-in for the reference's FlyingChairs-pretrained
            # FlowNet .params half of combine_model
            restored, flow_step = load_checkpoint(name)
            if "flownet" not in restored.get("params", {}):
                raise ValueError(f"pretrained_flow dir {name} has no "
                                 f"'flownet' param subtree")
            variables["params"], n_f = combine_checkpoints(
                variables["params"], {"flownet": restored["params"]["flownet"]})
            if logger is not None:
                logger.info(f"warm-started {n_f} flownet tensors from "
                            f"{name} (epoch {flow_step})")
            continue
        path = name if name.endswith(".params") else (
            "%s-%04d.params" % (name, int(cfg.network.pretrained_epoch)))
        if os.path.exists(path):
            sources.append(path)
        elif logger is not None:
            logger.warning(f"pretrained file not found, skipping: {path}")
    for path in sources:
        variables, report = import_mxnet_lsfa(
            variables, path,
            bbox_means=tuple(cfg.TRAIN.BBOX_MEANS),
            bbox_stds=tuple(cfg.TRAIN.BBOX_STDS))
        if logger is not None:
            logger.info(f"imported {len(report['imported'])} tensors from "
                        f"{path} ({len(report['unused'])} unused)")

    det = str(getattr(cfg.network, "pretrained_detector", "") or "")
    if det:
        # warm-start the shared detection stack from a trained detector
        # checkpoint (orbax dir, e.g. the single-frame R-FCN baseline's) —
        # the combine_model role for in-env two-stage training; module
        # names are identical across RFCN and LSFA, so subtree merge by
        # name + shape transfers backbone/feat_conv/RPN/heads and leaves
        # aggregation modules (flownet/rnet/small/Nq) at fresh init
        restored, det_step = load_checkpoint(det)
        shared = ("backbone", "feat_conv_3x3", "rpn_cls_score",
                  "rpn_bbox_pred", "rfcn_cls", "rfcn_bbox")
        src_p = {k: v for k, v in restored["params"].items() if k in shared}
        merged_p, n_p = combine_checkpoints(variables["params"], src_p)
        src_b = {k: v for k, v in (restored.get("batch_stats") or {}).items()
                 if k in shared}
        merged_b, n_b = combine_checkpoints(variables["batch_stats"], src_b)
        if n_p == 0:
            raise ValueError(
                f"pretrained_detector {det} (epoch {det_step}) shares no "
                f"parameter with this model — wrong checkpoint?")
        variables = {"params": merged_p, "batch_stats": merged_b}
        if logger is not None:
            logger.info(f"warm-started {n_p} param + {n_b} batch-stat "
                        f"tensors from detector checkpoint {det} "
                        f"(epoch {det_step})")

    params = seed_small_net(variables["params"])
    pd = str(getattr(cfg.tpu, "param_dtype", "float32"))
    if pd != "float32":
        # tpu.param_dtype: store parameters below f32 (halves checkpoint
        # + HBM weight footprint; compute still upcasts per compute_dtype)
        dt = jnp.dtype(pd)
        params = jax.tree_util.tree_map(
            lambda x: x.astype(dt)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    return model, params, variables.get("batch_stats", {})


def train_net(cfg, roidb=None, ckpt_dir: str | None = None,
              logger=None, max_steps: int | None = None,
              metrics_hook=None):
    """Run the full training recipe. Returns (params, batch_stats).

    metrics_hook(step, metrics_dict): called every step with the device
    metric arrays (convert lazily — forcing floats every step syncs the
    pipeline). Loader-wait vs step time is accumulated and logged at the
    end (is training step-bound or decode-bound on this host?)."""
    if logger is None:
        logger, out_dir = create_logger(cfg.output_path, cfg.symbol,
                                        cfg.dataset.image_set)
        # TRAIN.model_prefix names the checkpoint tree (the reference's
        # <prefix>-<epoch>.params naming, train_end2end.py:178)
        ckpt_dir = ckpt_dir or os.path.join(out_dir, "checkpoints",
                                            cfg.TRAIN.model_prefix)
    if roidb is None:
        roidb = load_train_roidb(cfg)

    mesh = make_mesh()
    n_dev = len(mesh.devices.reshape(-1))
    batch = cfg.TRAIN.BATCH_IMAGES * n_dev
    loader = TrainLoader(roidb, cfg, batch)
    steps_per_epoch = len(loader)
    lr_steps = [int(float(e) * steps_per_epoch)
                for e in str(cfg.TRAIN.lr_step).split(",")]

    model, params, batch_stats = init_model(cfg, logger=logger)
    optimizer = make_optimizer(
        params, base_lr=cfg.TRAIN.lr, lr_steps=lr_steps,
        lr_factor=cfg.TRAIN.lr_factor, momentum=cfg.TRAIN.momentum,
        wd=cfg.TRAIN.wd, warmup=cfg.TRAIN.warmup,
        warmup_lr=cfg.TRAIN.warmup_lr, warmup_step=cfg.TRAIN.warmup_step)
    opt_state = optimizer.init(params)

    begin_epoch = cfg.TRAIN.begin_epoch
    if cfg.TRAIN.RESUME and ckpt_dir:
        restored, step = load_checkpoint(
            ckpt_dir, template={"params": params, "batch_stats": batch_stats,
                                "opt_state": opt_state})
        params = restored["params"]
        batch_stats = restored["batch_stats"]
        opt_state = restored["opt_state"]
        begin_epoch = step
        logger.info(f"resumed from epoch {step}")

    settings = TrainSettings.from_config(cfg)
    if is_rfcn(cfg):
        train_step = make_rfcn_train_step(model, settings, optimizer)
    else:
        train_step = make_train_step(model, settings, None, optimizer)

    # replicate params, shard batches
    rsh = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("data"))
    params = jax.device_put(params, rsh)
    batch_stats = jax.device_put(batch_stats, rsh)
    opt_state = jax.tree.map(
        lambda x: jax.device_put(x, rsh) if hasattr(x, "shape") else x,
        opt_state)

    import time

    speedo = Speedometer(batch, cfg.default.frequent, logger)
    rng = jax.random.PRNGKey(42)
    step_count = 0
    data_wait = 0.0
    t_start = time.perf_counter()

    def _feed_summary():
        wall = time.perf_counter() - t_start
        if step_count and wall > 0:
            logger.info(
                f"feed summary: {step_count} steps in {wall:.1f}s "
                f"({step_count / wall:.2f} steps/s), loader-wait "
                f"{data_wait:.1f}s ({100 * data_wait / wall:.1f}% of wall)")

    for epoch in range(begin_epoch, cfg.TRAIN.end_epoch):
        it = iter(loader)
        while True:
            t0 = time.perf_counter()
            host_batch = next(it, None)
            data_wait += time.perf_counter() - t0
            if host_batch is None:
                break
            dev_batch = jax.tree.map(
                lambda x: jax.device_put(x, bsh), host_batch)
            rng, sub = jax.random.split(rng)
            params, batch_stats, opt_state, metrics = train_step(
                params, batch_stats, opt_state, dev_batch, sub)
            speedo(step_count, metrics)
            if metrics_hook is not None:
                metrics_hook(step_count, metrics)
            step_count += 1
            if max_steps is not None and step_count >= max_steps:
                logger.info("max_steps reached, stopping early")
                _feed_summary()
                if ckpt_dir:
                    save_checkpoint(ckpt_dir, epoch + 1, params, batch_stats,
                                    opt_state)
                return params, batch_stats
        if ckpt_dir:
            save_checkpoint(ckpt_dir, epoch + 1, params, batch_stats, opt_state)
            logger.info(f"checkpointed epoch {epoch + 1}")
    _feed_summary()
    return params, batch_stats
