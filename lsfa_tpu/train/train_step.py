"""The jitted end-to-end LSFA training step (data-parallel over a Mesh).

Replaces the reference's entire per-batch host loop
(dff_rfcn/core/module.py:968-1013 fit + DataParallelExecutorGroup
scatter + the Python custom ops that forced device<->host syncs every
iteration: ChooseFeat, proposal_target, OHEM — see SURVEY.md section 3.1).
Here everything from anchor assignment to the OHEM-selected losses is one
XLA program: the host only ships images, gt boxes, motion vectors and
residuals.

Sharding: batch dim over the 'data' mesh axis, params replicated; XLA
inserts the gradient all-reduce (ICI) — the kvstore replacement.
"""

from __future__ import annotations

import dataclasses
from functools import partial
import jax
import jax.numpy as jnp
import optax

from lsfa_tpu.ops.anchors import anchor_grid
from lsfa_tpu.ops.proposal import rpn_proposals
from lsfa_tpu.ops.psroi_pool import psroi_pool
from lsfa_tpu.train.anchor_assign import assign_anchors
from lsfa_tpu.train.losses import rcnn_losses, rpn_losses
from lsfa_tpu.train.ohem import ohem_select
from lsfa_tpu.train.proposal_target import proposal_target, sample_rois_fixed


@dataclasses.dataclass(frozen=True)
class TrainSettings:
    """Static (compile-time) training knobs, extracted from the config."""

    num_classes: int = 31
    # 2 under CLASS_AGNOSTIC, else num_classes (symbols/...:281)
    num_reg_classes: int = 2
    # TRAIN.BBOX_NORMALIZATION_PRECOMPUTED (core/rcnn.py:183-186)
    bbox_normalization_precomputed: bool = True
    num_anchors: int = 9
    feat_stride: int = 16
    anchor_scales: tuple = (8, 16, 32)
    anchor_ratios: tuple = (0.5, 1, 2)
    anchor_means: tuple = (0.0, 0.0, 0.0, 0.0)
    anchor_stds: tuple = (0.1, 0.1, 0.4, 0.4)
    normalize_rpn: bool = True
    rpn_batch: int = 256
    rpn_fg_fraction: float = 0.5
    rpn_pos_thresh: float = 0.7
    rpn_neg_thresh: float = 0.3
    # bg assignment runs AFTER fg when set (lib/rpn/rpn.py:229-239)
    rpn_clobber_positives: bool = False
    # per-coordinate weight on positive-anchor bbox loss (lib/rpn/rpn.py:253)
    rpn_bbox_weights: tuple = (1.0, 1.0, 1.0, 1.0)
    pre_nms_top_n: int = 6000
    post_nms_top_n: int = 300
    nms_thresh: float = 0.7
    min_size: int = 0
    fg_thresh: float = 0.5
    bbox_means: tuple = (0.0, 0.0, 0.0, 0.0)
    bbox_stds: tuple = (0.1, 0.1, 0.2, 0.2)
    bbox_weights: tuple = (1.0, 1.0, 1.0, 1.0)
    ohem_rois: int = 128
    group_size: int = 7
    # BATCH_ROIS > 0 recipe (no OHEM): fixed fg/bg minibatch sampling
    # (core/rcnn.py:126-191); -1 keeps all rois and OHEM selects.
    enable_ohem: bool = True
    batch_rois: int = -1
    fg_fraction: float = 0.25
    bg_thresh_hi: float = 0.5
    bg_thresh_lo: float = 0.0
    # RPN-NMS acceleration, same knobs the eval path runs (cfg.tpu.*):
    # tier = run NMS on only the top `nms_tier` pre-NMS boxes — exact
    # whenever the tier yields >= post_nms_top_n keeps (ops/proposal.py
    # rpn_proposals docstring); pallas = fused-VMEM suppression kernel.
    # The 6000-box untiered suppression matrix was trained-path-only
    # cost the eval path had already shed (r4: tier+pallas won the
    # interleaved e2e A/B by ~4%).
    nms_tier: int = 0
    nms_pallas: bool = False

    @classmethod
    def from_config(cls, cfg):
        return cls(
            num_classes=cfg.dataset.NUM_CLASSES,
            num_reg_classes=(2 if cfg.CLASS_AGNOSTIC
                             else cfg.dataset.NUM_CLASSES),
            bbox_normalization_precomputed=(
                cfg.TRAIN.BBOX_NORMALIZATION_PRECOMPUTED),
            num_anchors=cfg.network.NUM_ANCHORS,
            feat_stride=cfg.network.RPN_FEAT_STRIDE,
            anchor_scales=tuple(cfg.network.ANCHOR_SCALES),
            anchor_ratios=tuple(cfg.network.ANCHOR_RATIOS),
            anchor_means=tuple(cfg.network.ANCHOR_MEANS),
            anchor_stds=tuple(cfg.network.ANCHOR_STDS),
            normalize_rpn=cfg.network.NORMALIZE_RPN,
            rpn_batch=cfg.TRAIN.RPN_BATCH_SIZE,
            rpn_fg_fraction=cfg.TRAIN.RPN_FG_FRACTION,
            rpn_pos_thresh=cfg.TRAIN.RPN_POSITIVE_OVERLAP,
            rpn_neg_thresh=cfg.TRAIN.RPN_NEGATIVE_OVERLAP,
            rpn_clobber_positives=cfg.TRAIN.RPN_CLOBBER_POSITIVES,
            rpn_bbox_weights=tuple(cfg.TRAIN.RPN_BBOX_WEIGHTS),
            pre_nms_top_n=cfg.TRAIN.RPN_PRE_NMS_TOP_N,
            post_nms_top_n=cfg.TRAIN.RPN_POST_NMS_TOP_N,
            nms_thresh=cfg.TRAIN.RPN_NMS_THRESH,
            min_size=cfg.TRAIN.RPN_MIN_SIZE,
            fg_thresh=cfg.TRAIN.FG_THRESH,
            bbox_means=tuple(cfg.TRAIN.BBOX_MEANS),
            bbox_stds=tuple(cfg.TRAIN.BBOX_STDS),
            bbox_weights=tuple(cfg.TRAIN.BBOX_WEIGHTS),
            ohem_rois=cfg.TRAIN.BATCH_ROIS_OHEM,
            enable_ohem=cfg.TRAIN.ENABLE_OHEM,
            batch_rois=cfg.TRAIN.BATCH_ROIS,
            fg_fraction=cfg.TRAIN.FG_FRACTION,
            bg_thresh_hi=cfg.TRAIN.BG_THRESH_HI,
            bg_thresh_lo=cfg.TRAIN.BG_THRESH_LO,
            nms_tier=int(getattr(cfg.tpu, "nms_tier", 0)),
            nms_pallas=bool(getattr(cfg.tpu, "nms_pallas", False)),
        )


def detection_losses(out, batch, anchors, rng, s: TrainSettings):
    """From head maps + gt to the four losses. Pure; vmapped internals."""
    b, fh, fw, _ = out["rpn_cls"].shape
    a = s.num_anchors

    # ---- RPN targets (on-device anchor assignment, per image) ----
    keys = jax.random.split(rng, b)
    assign = jax.vmap(lambda gt, gv, ii, k: assign_anchors(
        anchors, gt, gv, ii, k,
        rpn_batch=s.rpn_batch, fg_fraction=s.rpn_fg_fraction,
        pos_thresh=s.rpn_pos_thresh, neg_thresh=s.rpn_neg_thresh,
        clobber_positives=s.rpn_clobber_positives,
        normalize=s.normalize_rpn, means=s.anchor_means, stds=s.anchor_stds,
        rpn_bbox_weights=s.rpn_bbox_weights,
    ))(batch["gt_boxes"], batch["gt_valid"], batch["im_info"], keys)
    rpn_labels = assign["label"].reshape(b, fh, fw, a)
    rpn_t = assign["bbox_target"].reshape(b, fh, fw, a * 4)
    rpn_w = assign["bbox_weight"].reshape(b, fh, fw, a * 4)

    rpn_cls_loss, rpn_bbox_loss = rpn_losses(
        out["rpn_cls"], out["rpn_bbox"], rpn_labels, rpn_t, rpn_w,
        num_anchors=a, rpn_batch=s.rpn_batch, normalized=s.normalize_rpn)

    # ---- proposals (no gradient) ----
    a_means = jnp.tile(jnp.asarray(s.anchor_means, jnp.float32), a)
    a_stds = jnp.tile(jnp.asarray(s.anchor_stds, jnp.float32), a)
    fg_pair = jnp.stack([out["rpn_cls"][..., :a], out["rpn_cls"][..., a:]], -1)
    fg_probs = jax.nn.softmax(jax.lax.stop_gradient(fg_pair), axis=-1)[..., 1]
    deltas = jax.lax.stop_gradient(out["rpn_bbox"])
    if s.normalize_rpn:
        deltas = deltas * a_stds + a_means

    def one_img(fg, dl, ii):
        return rpn_proposals(fg, dl, anchors, ii,
                             pre_nms_top_n=s.pre_nms_top_n,
                             post_nms_top_n=s.post_nms_top_n,
                             nms_thresh=s.nms_thresh, min_size=s.min_size,
                             feat_stride=s.feat_stride,
                             nms_tier=s.nms_tier, use_pallas=s.nms_pallas)

    rois, _, _ = jax.vmap(one_img)(fg_probs, deltas, batch["im_info"])

    # ---- roi targets ----
    tgt = jax.vmap(lambda r, gt, gv: proposal_target(
        r, gt, gv, fg_thresh=s.fg_thresh, bbox_means=s.bbox_means,
        bbox_stds=s.bbox_stds, bbox_weights=s.bbox_weights,
        num_reg_classes=s.num_reg_classes,
        normalization_precomputed=s.bbox_normalization_precomputed,
    ))(rois, batch["gt_boxes"], batch["gt_valid"])
    if s.batch_rois > 0:
        # BATCH_ROIS > 0: fixed fg/bg minibatch (core/rcnn.py:126-191)
        skeys = jax.random.split(jax.random.fold_in(rng, 1), b)
        tgt = jax.vmap(lambda t, k: sample_rois_fixed(
            t, k, batch_rois=s.batch_rois, fg_fraction=s.fg_fraction,
            bg_thresh_hi=s.bg_thresh_hi, bg_thresh_lo=s.bg_thresh_lo,
        ))(tgt, skeys)

    # ---- R-FCN head scoring ----
    def score_img(cls_map, bbox_map, r):
        pooled_cls = psroi_pool(cls_map, r, output_dim=s.num_classes,
                                group_size=s.group_size,
                                spatial_scale=1.0 / s.feat_stride)
        pooled_bbox = psroi_pool(bbox_map, r,
                                 output_dim=4 * s.num_reg_classes,
                                 group_size=s.group_size,
                                 spatial_scale=1.0 / s.feat_stride)
        return (jnp.mean(pooled_cls, axis=(1, 2)),
                jnp.mean(pooled_bbox, axis=(1, 2)))

    cls_scores, bbox_preds = jax.vmap(score_img)(
        out["rfcn_cls_map"], out["rfcn_bbox_map"], tgt["rois"])

    if s.enable_ohem:
        # ---- OHEM (selection is gradient-free) ----
        lab, w = jax.vmap(lambda cs, bp, l, t, bw, v: ohem_select(
            jax.lax.stop_gradient(cs), jax.lax.stop_gradient(bp), l, t, bw, v,
            roi_per_img=s.ohem_rois,
        ))(cls_scores, bbox_preds, tgt["label"], tgt["bbox_target"],
           tgt["bbox_weight"], tgt["valid"])
        norm = s.ohem_rois
    else:
        # plain path (reference :433-436): all sampled rois contribute,
        # bbox loss normalized by BATCH_ROIS
        lab = jnp.where(tgt["valid"], tgt["label"], -1.0)
        w = tgt["bbox_weight"]
        norm = max(s.batch_rois, 1)

    rcnn_cls_loss, rcnn_bbox_loss = rcnn_losses(
        cls_scores, bbox_preds, lab, tgt["bbox_target"], w,
        ohem_count=norm)

    # metrics mirroring the reference's 6 EvalMetrics (dff_rfcn/core/metric.py)
    pair = jnp.stack([out["rpn_cls"][..., :a], out["rpn_cls"][..., a:]], -1)
    rpn_pred = jnp.argmax(pair, axis=-1)
    rpn_mask = rpn_labels >= 0
    rpn_acc = jnp.sum((rpn_pred == rpn_labels) & rpn_mask) / jnp.maximum(
        jnp.sum(rpn_mask), 1)
    rcnn_pred = jnp.argmax(cls_scores, axis=-1)
    rcnn_mask = lab >= 0
    rcnn_acc = jnp.sum((rcnn_pred == lab) & rcnn_mask) / jnp.maximum(
        jnp.sum(rcnn_mask), 1)

    losses = {
        "rpn_cls_loss": rpn_cls_loss, "rpn_bbox_loss": rpn_bbox_loss,
        "rcnn_cls_loss": rcnn_cls_loss, "rcnn_bbox_loss": rcnn_bbox_loss,
    }
    metrics = {"rpn_acc": rpn_acc, "rcnn_acc": rcnn_acc, **losses}
    total = sum(losses.values())
    return total, metrics


def make_train_step(model, settings: TrainSettings, feat_hw=None, optimizer=None):
    """Build the jitted train step. One step function serves every image
    bucket: the anchor grid is computed at trace time from the batch's
    static feature shape, so jit specializes per bucket automatically
    (replacing MutableModule's max-shape bind + rebinding,
    dff_rfcn/core/module.py:796-850). `feat_hw` is accepted for backward
    compatibility and ignored."""
    del feat_hw

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, batch_stats, opt_state, batch, rng):
        fh, fw = batch["motion_vector"].shape[1:3]   # static under trace
        anchors = jnp.asarray(anchor_grid(
            fh, fw, settings.feat_stride,
            settings.anchor_ratios, settings.anchor_scales))

        def loss_fn(p):
            # mutable batch_stats: config variants with train-mode BN
            # (res_diff_bn, small_net_bn_before_fuse — reference
            # resnet_v1_101_flownet_rfcn.py:61-63,232-244) update their
            # moving stats; frozen BNs leave the collection untouched.
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                batch["data"], batch["data_ref"],
                batch["data_ref_old"], batch["eq_flag"], batch["eq_flag_old"],
                batch["motion_vector"], batch["res_diff"],
                method=model.forward_train, mutable=["batch_stats"])
            total, metrics = detection_losses(out, batch, anchors, rng,
                                              settings)
            return total, (metrics, mut.get("batch_stats", batch_stats))

        (total, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["total_loss"] = total
        return params, new_stats, opt_state, metrics

    return train_step


def make_rfcn_train_step(model, settings: TrainSettings, optimizer):
    """Train step for the single-frame R-FCN baseline (the reference's
    rfcn/train_end2end.py role): same detection losses, single image input."""

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, batch_stats, opt_state, batch, rng):
        fh, fw = (batch["data"].shape[1] // settings.feat_stride,
                  batch["data"].shape[2] // settings.feat_stride)
        anchors = jnp.asarray(anchor_grid(
            fh, fw, settings.feat_stride,
            settings.anchor_ratios, settings.anchor_scales))

        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                batch["data"], True, mutable=["batch_stats"])
            total, metrics = detection_losses(out, batch, anchors, rng,
                                              settings)
            return total, (metrics, mut.get("batch_stats", batch_stats))

        (total, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["total_loss"] = total
        return params, new_stats, opt_state, metrics

    return train_step
