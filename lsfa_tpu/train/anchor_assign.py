"""RPN anchor assignment — fixed-shape, jittable, on-device.

Behavioral target: assign_anchor (lib/rpn/rpn.py:119-291):
  * anchors fully inside the (real) image participate; others label -1,
  * bg where max IoU < RPN_NEGATIVE_OVERLAP,
  * fg for every anchor achieving some gt's max IoU, plus max IoU >=
    RPN_POSITIVE_OVERLAP,
  * random subsample: at most 128 fg, total 256 labeled,
  * regression targets toward the argmax gt, normalized by ANCHOR
    mean/std when NORMALIZE_RPN, weights (1,1,1,1) on fg.

TPU redesign: the reference runs this in loader worker processes on the
host per sample; here it is a pure jnp function executed inside the jitted
train step (gt boxes ride to the device as a fixed-size padded tensor), so
the host pipeline only ships images + boxes. Random subsampling uses a JAX
PRNG key (uniform ranking == choice-without-replacement).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lsfa_tpu.ops.boxes import bbox_transform, pairwise_iou


def assign_anchors(anchors, gt_boxes, gt_valid, im_info, key,
                   rpn_batch: int = 256, fg_fraction: float = 0.5,
                   pos_thresh: float = 0.7, neg_thresh: float = 0.3,
                   clobber_positives: bool = False,
                   allowed_border: float = 0.0,
                   normalize: bool = True,
                   means=(0.0, 0.0, 0.0, 0.0), stds=(0.1, 0.1, 0.4, 0.4),
                   rpn_bbox_weights=(1.0, 1.0, 1.0, 1.0)):
    """Single-image anchor labeling.

    Args:
      anchors: (K, 4) anchor grid (K = H*W*A).
      gt_boxes: (G, 5) [x1, y1, x2, y2, cls] padded.
      gt_valid: (G,) bool.
      im_info: (3,) [h, w, scale] real image extent.
      key: PRNG key for subsampling.

    Returns dict: label (K,) in {-1, 0, 1}; bbox_target (K, 4);
      bbox_weight (K, 4).
    """
    k = anchors.shape[0]
    inside = ((anchors[:, 0] >= -allowed_border)
              & (anchors[:, 1] >= -allowed_border)
              & (anchors[:, 2] < im_info[1] + allowed_border)
              & (anchors[:, 3] < im_info[0] + allowed_border))

    iou = pairwise_iou(anchors, gt_boxes[:, :4])          # (K, G)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    any_gt = jnp.any(gt_valid)
    max_iou = jnp.max(iou, axis=1)
    argmax_gt = jnp.argmax(iou, axis=1)

    # per-gt best anchors (all ties), restricted to inside anchors:
    # outside anchors are excluded from the candidate set entirely
    iou_in = jnp.where(inside[:, None], iou, -1.0)
    gt_max = jnp.max(iou_in, axis=0)                      # (G,)
    is_gt_best = jnp.any((iou_in == gt_max[None, :]) & gt_valid[None, :]
                         & (gt_max[None, :] > 0), axis=1)

    label = jnp.full((k,), -1.0)
    max_iou_in = jnp.where(inside, max_iou, -1.0)
    if not clobber_positives:
        label = jnp.where(inside & (max_iou_in < neg_thresh), 0.0, label)
        label = jnp.where(is_gt_best, 1.0, label)
        label = jnp.where(inside & (max_iou_in >= pos_thresh), 1.0, label)
    else:
        label = jnp.where(is_gt_best, 1.0, label)
        label = jnp.where(inside & (max_iou_in >= pos_thresh), 1.0, label)
        label = jnp.where(inside & (max_iou_in < neg_thresh), 0.0, label)
    # no gt at all: every inside anchor is background (rpn.py:227-228)
    label = jnp.where(any_gt, label, jnp.where(inside, 0.0, -1.0))

    # random subsampling to the fixed batch
    kf, kb = jax.random.split(key)
    num_fg_quota = int(fg_fraction * rpn_batch)

    def subsample(lbl, is_cls, quota, rk):
        if quota <= 0:       # static: sort(r)[quota-1] would wrap to -1
            return jnp.where(is_cls, -1.0, lbl)
        n_cls = jnp.sum(is_cls)
        r = jax.random.uniform(rk, (k,))
        r = jnp.where(is_cls, r, 2.0)                     # non-members sort last
        # threshold = quota-th smallest random value among members
        kth = jnp.sort(r)[jnp.minimum(quota, k) - 1]
        keep = is_cls & (r <= kth)
        return jnp.where(n_cls > quota, jnp.where(is_cls & ~keep, -1.0, lbl), lbl)

    label = subsample(label, label == 1.0, num_fg_quota, kf)
    num_fg = jnp.sum(label == 1.0).astype(jnp.int32)
    bg_quota = rpn_batch - num_fg
    r = jax.random.uniform(kb, (k,))
    r = jnp.where(label == 0.0, r, 2.0)
    kth = jnp.sort(r)[jnp.clip(bg_quota, 1, k) - 1]
    n_bg = jnp.sum(label == 0.0)
    drop_bg = (label == 0.0) & (r > kth)
    label = jnp.where(n_bg > bg_quota, jnp.where(drop_bg, -1.0, label), label)

    # regression targets toward the argmax gt
    tgt_gt = gt_boxes[argmax_gt, :4]
    bbox_target = bbox_transform(anchors, tgt_gt)
    bbox_target = jnp.where(any_gt, bbox_target, 0.0)
    if normalize:
        bbox_target = (bbox_target - jnp.asarray(means)) / jnp.asarray(stds)
    # positives carry TRAIN.RPN_BBOX_WEIGHTS per coordinate
    # (lib/rpn/rpn.py:253)
    bbox_weight = jnp.where((label == 1.0)[:, None],
                            jnp.asarray(rpn_bbox_weights, jnp.float32), 0.0)
    bbox_target = bbox_target * (bbox_weight > 0)         # zero out unused slots
    return {"label": label, "bbox_target": bbox_target, "bbox_weight": bbox_weight}
