"""Test-time detection pipeline: proposals -> PSROI scoring -> per-class NMS.

Behavioral targets:
  * im_detect (dff_rfcn/core/tester.py:130-160): forward, decode boxes
    (bbox_pred + clip_boxes), rescale to original image coordinates;
  * pred_eval post-processing (tester.py:265-281): per-class score
    threshold, greedy NMS at TEST.NMS=0.3, cap max_per_image;
  * the bbox-std "baking" trick (core/callback.py:54-65 writes
    rfcn_bbox_test weights with TRAIN.BBOX_STDS multiplied in) is kept as
    an explicit decode step here instead of mutating weights.

TPU redesign: the reference runs NMS and box decode on host NumPy per
frame; here the whole pipeline after the network forward is one jitted
program (per-class NMS = vmap of the fixed-shape NMS over classes), so a
frame's detections leave the device as one small fixed-size tensor.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lsfa_tpu.ops.boxes import bbox_pred, clip_boxes
from lsfa_tpu.ops.nms import nms_fixed
from lsfa_tpu.ops.proposal import rpn_proposals
from lsfa_tpu.ops.psroi_pool import psroi_pool


@partial(jax.jit, static_argnames=("num_classes", "max_per_image", "nms_thresh",
                                   "score_thresh", "bbox_stds", "bbox_means",
                                   "num_reg_classes"))
def postprocess_detections(cls_prob, bbox_deltas, rois, roi_valid, im_info,
                           num_classes: int, max_per_image: int = 300,
                           nms_thresh: float = 0.3, score_thresh: float = 1e-3,
                           bbox_stds=(0.1, 0.1, 0.2, 0.2),
                           bbox_means=(0.0, 0.0, 0.0, 0.0),
                           num_reg_classes: int = 2):
    """Single image. cls_prob: (R, C) softmax scores; bbox_deltas:
    (R, 4*num_reg_classes) normalized deltas (class-agnostic fg slot 1
    when num_reg_classes == 2, else one slot per class); rois: (R, 5);
    im_info: (3,).

    Returns (max_per_image, 6) [label, score, x1, y1, x2, y2] in ORIGINAL
    image coordinates + validity mask (max_per_image,).
    """
    r = rois.shape[0]
    # un-normalize every regression slot and decode (explicit replacement
    # for the reference's baked *_test weights)
    stds = jnp.asarray(bbox_stds, jnp.float32)
    means = jnp.asarray(bbox_means, jnp.float32)
    deltas = bbox_deltas.reshape(r, num_reg_classes, 4) * stds + means
    deltas = deltas[:, 1:]                           # bg slot 0 never decoded

    def decode_slot(d):
        b = bbox_pred(rois[:, 1:5], d)
        b = clip_boxes(b, im_info[:2])
        return b / im_info[2]                        # back to original coords

    boxes_all = jax.vmap(decode_slot, in_axes=1)(deltas)  # (num_reg-1, R, 4)

    def per_class(c_scores, c_boxes):
        ok = roi_valid & (c_scores > score_thresh)
        keep_idx, keep_valid = nms_fixed(c_boxes, c_scores, nms_thresh,
                                         max_per_image, valid=ok)
        return keep_idx, keep_valid

    # classes 1..C-1 (skip background); each fg class scores against its
    # regression slot (slot 1 for all classes when agnostic)
    fg_scores = cls_prob[:, 1:].T                    # (C-1, R)
    if num_reg_classes == 2:
        cls_boxes = jnp.broadcast_to(boxes_all[0][None],
                                     (num_classes - 1, r, 4))
    else:
        cls_boxes = boxes_all
    keep_idx, keep_valid = jax.vmap(per_class)(fg_scores, cls_boxes)
    c_minus1, m = keep_idx.shape
    labels = jnp.broadcast_to(jnp.arange(1, num_classes)[:, None], (c_minus1, m))
    scores = jnp.take_along_axis(fg_scores, keep_idx, axis=1)
    scores = jnp.where(keep_valid, scores, -1.0)
    flat_boxes = jnp.take_along_axis(
        cls_boxes, keep_idx[:, :, None], axis=1)     # (C-1, M, 4)

    # global top max_per_image across classes (tester.py:276-281)
    flat_scores = scores.reshape(-1)
    top_scores, top_i = jax.lax.top_k(flat_scores, max_per_image)
    out_valid = top_scores > 0
    out_labels = labels.reshape(-1)[top_i].astype(jnp.float32)
    out_boxes = flat_boxes.reshape(-1, 4)[top_i]
    dets = jnp.concatenate(
        [out_labels[:, None], top_scores[:, None], out_boxes], axis=1)
    return dets, out_valid


def detect_single(rpn_fg, rpn_deltas, cls_map, bbox_map, anchors, im_info,
                  num_classes: int,
                  pre_nms: int = 6000, post_nms: int = 300,
                  rpn_nms_thresh: float = 0.7, min_size: int = 0,
                  feat_stride: int = 16, max_per_image: int = 300,
                  nms_thresh: float = 0.3, score_thresh: float = 1e-3,
                  bbox_stds=(0.1, 0.1, 0.2, 0.2), nms_tier: int = 0,
                  group_size: int = 7, num_reg_classes: int = 2,
                  nms_pallas: bool = False):
    """Single-image (unbatched maps) detection pipeline. vmap-friendly."""
    rois, _, roi_valid = rpn_proposals(
        rpn_fg, rpn_deltas, anchors, im_info,
        pre_nms_top_n=pre_nms, post_nms_top_n=post_nms,
        nms_thresh=rpn_nms_thresh, min_size=min_size, feat_stride=feat_stride,
        nms_tier=nms_tier, use_pallas=nms_pallas)
    pooled_cls = psroi_pool(cls_map, rois, output_dim=num_classes,
                            group_size=group_size, pooled_size=group_size,
                            spatial_scale=1.0 / feat_stride)
    pooled_bbox = psroi_pool(bbox_map, rois, output_dim=4 * num_reg_classes,
                             group_size=group_size, pooled_size=group_size,
                             spatial_scale=1.0 / feat_stride)
    cls_scores = jnp.mean(pooled_cls, axis=(1, 2))
    bbox_deltas = jnp.mean(pooled_bbox, axis=(1, 2))
    cls_prob = jax.nn.softmax(cls_scores, axis=-1)
    return postprocess_detections(
        cls_prob, bbox_deltas, rois, roi_valid, im_info,
        num_classes=num_classes, max_per_image=max_per_image,
        nms_thresh=nms_thresh, score_thresh=score_thresh,
        bbox_stds=bbox_stds, num_reg_classes=num_reg_classes)


def detect_from_maps(out, anchors, im_info, **kw):
    """From a phase-graph output dict (leading batch dim 1) to final
    detections. Jit-compatible; composed into the tester's jitted steps."""
    return detect_single(out["rpn_fg"][0], out["rpn_deltas"][0],
                         out["rfcn_cls_map"][0], out["rfcn_bbox_map"][0],
                         anchors, im_info, **kw)


def detect_batch(out, anchors, im_info, **kw):
    """vmapped detection over the leading batch dim of a phase-graph
    output. im_info: (3,) shared across the batch, or (B, 3) per-lane."""
    if im_info.ndim == 2:
        return jax.vmap(
            lambda fg, dl, cm, bm, ii: detect_single(fg, dl, cm, bm, anchors,
                                                     ii, **kw)
        )(out["rpn_fg"], out["rpn_deltas"], out["rfcn_cls_map"],
          out["rfcn_bbox_map"], im_info)
    return jax.vmap(
        lambda fg, dl, cm, bm: detect_single(fg, dl, cm, bm, anchors,
                                             im_info, **kw)
    )(out["rpn_fg"], out["rpn_deltas"], out["rfcn_cls_map"],
      out["rfcn_bbox_map"])
