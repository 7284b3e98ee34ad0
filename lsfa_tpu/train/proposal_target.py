"""ROI target assignment (proposal_target) — fixed-shape, jittable.

Behavioral target: dff_rfcn/operator_py/proposal_target.py:44-81 +
core/rcnn.py:126-191 + lib/bbox/bbox_regression.py:118-141, specialized
to the shipped recipe (BATCH_ROIS = -1: keep ALL rois, no fg/bg
subsampling — OHEM does the selection downstream):

  * append the gt boxes to the proposal rois,
  * label each roi with the class of its argmax-IoU gt if IoU >= FG_THRESH,
    else background (0),
  * regression targets toward the argmax gt, normalized by
    BBOX_MEANS/STDS when BBOX_NORMALIZATION_PRECOMPUTED, expanded to
    (N, 4*num_reg_classes): fg slot 1 when CLASS_AGNOSTIC, else the
    roi's class slot (lib/bbox/bbox_regression.py:120-141), weights
    BBOX_WEIGHTS on fg rois.

Fixed shapes: gt arrives padded to max_gt with a validity mask; outputs
are (R + max_gt)-sized with a validity mask (invalid slots labeled -1 so
every downstream loss ignores them).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lsfa_tpu.ops.boxes import bbox_transform, pairwise_iou


def proposal_target(rois, gt_boxes, gt_valid,
                    fg_thresh: float = 0.5,
                    bbox_means=(0.0, 0.0, 0.0, 0.0),
                    bbox_stds=(0.1, 0.1, 0.2, 0.2),
                    bbox_weights=(1.0, 1.0, 1.0, 1.0),
                    num_reg_classes: int = 2,
                    normalization_precomputed: bool = True):
    """Single-image ROI labeling.

    Args:
      rois: (R, 5) [batch0, x1, y1, x2, y2] from the proposal op.
      gt_boxes: (G, 5) [x1, y1, x2, y2, cls] padded.
      gt_valid: (G,) bool.
      num_reg_classes: 2 for CLASS_AGNOSTIC (fg slot 1), else num_classes
        (fg slot = roi class — lib/bbox/bbox_regression.py:120-141
        expand_bbox_regression_targets).
      normalization_precomputed: TRAIN.BBOX_NORMALIZATION_PRECOMPUTED —
        normalize targets by BBOX_MEANS/STDS (core/rcnn.py:183-186).

    Returns dict:
      rois (R+G, 5), label (R+G,) float in {-1, 0, 1..C-1},
      bbox_target (R+G, 4*num_reg_classes), bbox_weight (same),
      valid (R+G,) bool.
    """
    g = gt_boxes.shape[0]
    gt_as_rois = jnp.concatenate(
        [jnp.zeros((g, 1), rois.dtype), gt_boxes[:, :4]], axis=1)
    all_rois = jnp.concatenate([rois, gt_as_rois], axis=0)
    valid = jnp.concatenate(
        [jnp.ones((rois.shape[0],), bool), gt_valid], axis=0)

    iou = pairwise_iou(all_rois[:, 1:5], gt_boxes[:, :4])
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    max_iou = jnp.max(iou, axis=1)
    argmax_gt = jnp.argmax(iou, axis=1)
    any_gt = jnp.any(gt_valid)

    is_fg = (max_iou >= fg_thresh) & valid & any_gt
    label = jnp.where(is_fg, gt_boxes[argmax_gt, 4], 0.0)
    label = jnp.where(valid, label, -1.0)

    targets = bbox_transform(all_rois[:, 1:5], gt_boxes[argmax_gt, :4])
    if normalization_precomputed:
        targets = (targets - jnp.asarray(bbox_means)) / jnp.asarray(bbox_stds)
    # select-out non-fg rows (AFTER normalization, so they are truly 0)
    # before the onehot multiply: a degenerate roi (inverted box from an
    # extreme RPN delta) yields nan/inf transform values, and 0 * nan =
    # nan would leak through the masked expansion into the loss
    # (where() selects, avoiding the product entirely)
    targets = jnp.where(is_fg[:, None], targets, 0.0)
    # class expansion: agnostic -> fg slot 1; per-class -> the roi's class
    n = all_rois.shape[0]
    slot = (jnp.ones((n,), jnp.int32) if num_reg_classes == 2
            else jnp.clip(label.astype(jnp.int32), 0, num_reg_classes - 1))
    onehot = jax.nn.one_hot(slot, num_reg_classes,
                            dtype=jnp.float32) * is_fg[:, None]
    bbox_target = (onehot[:, :, None] * targets[:, None, :]).reshape(
        n, 4 * num_reg_classes)
    bbox_weight = (onehot[:, :, None]
                   * jnp.asarray(bbox_weights, jnp.float32)[None, None, :]
                   ).reshape(n, 4 * num_reg_classes)
    return {"rois": all_rois, "label": label, "bbox_target": bbox_target,
            "bbox_weight": bbox_weight, "valid": valid, "max_iou": max_iou}


def sample_rois_fixed(tgt: dict, key, batch_rois: int = 128,
                      fg_fraction: float = 0.25,
                      bg_thresh_hi: float = 0.5, bg_thresh_lo: float = 0.0):
    """BATCH_ROIS > 0 fg/bg subsampling (core/rcnn.py:126-191) as a
    fixed-shape jittable op over proposal_target's output.

    Reference semantics: sample up to round(fg_fraction*batch_rois)
    foreground rois (IoU >= FG_THRESH) without replacement, fill the rest
    with background rois from the [bg_thresh_lo, bg_thresh_hi) IoU band,
    then gap-fill with uniformly random rois relabeled background. Every
    non-fg output slot is labeled 0 (the reference's
    ``labels[fg_rois_per_this_image:] = 0``).

    Returns a dict shaped (batch_rois, ...): rois, label, bbox_target,
    bbox_weight, valid (all True — the minibatch is always full when the
    input has >= 1 valid roi).
    """
    import jax

    n = tgt["rois"].shape[0]
    fg_n = int(round(fg_fraction * batch_rois))
    valid = tgt["valid"]
    is_fg = (tgt["label"] > 0) & valid
    is_bg = ((tgt["max_iou"] < bg_thresh_hi) & (tgt["max_iou"] >= bg_thresh_lo)
             & valid)

    kf, kb, kg = jax.random.split(key, 3)

    def rank_of(mask, k):
        """Random rank among mask members (without replacement)."""
        pri = jnp.where(mask, jax.random.uniform(k, (n,)), jnp.inf)
        order = jnp.argsort(pri)          # members first, random order
        rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n))
        return jnp.where(mask, rank, n)

    fg_rank = rank_of(is_fg, kf)
    fg_sel = fg_rank < fg_n
    n_fg = jnp.sum(fg_sel)

    bg_rank = rank_of(is_bg, kb)
    bg_sel = bg_rank < (batch_rois - n_fg)
    n_bg = jnp.sum(bg_sel)

    gap = batch_rois - n_fg - n_bg
    gap_rank = rank_of(valid, kg)
    gap_sel = gap_rank < gap

    # compact [fg | bg | gap] into batch_rois slots via cumsum scatter
    slot_fg = jnp.cumsum(fg_sel) - 1
    slot_bg = n_fg + jnp.cumsum(bg_sel) - 1
    slot_gap = n_fg + n_bg + jnp.cumsum(gap_sel) - 1
    idx = jnp.arange(n, dtype=jnp.int32)
    sel_idx = jnp.zeros((batch_rois,), jnp.int32)
    sel_idx = sel_idx.at[jnp.where(fg_sel, slot_fg, batch_rois)].set(
        idx, mode="drop")
    sel_idx = sel_idx.at[jnp.where(bg_sel, slot_bg, batch_rois)].set(
        idx, mode="drop")
    sel_idx = sel_idx.at[jnp.where(gap_sel, slot_gap, batch_rois)].set(
        idx, mode="drop")

    out_slots = jnp.arange(batch_rois)
    keep_fg = out_slots < n_fg            # only fg slots keep their label
    label = jnp.where(keep_fg, tgt["label"][sel_idx], 0.0)
    bw = jnp.where(keep_fg[:, None], tgt["bbox_weight"][sel_idx], 0.0)
    bt = jnp.where(keep_fg[:, None], tgt["bbox_target"][sel_idx], 0.0)
    return {"rois": tgt["rois"][sel_idx], "label": label,
            "bbox_target": bt, "bbox_weight": bw,
            "valid": jnp.ones((batch_rois,), bool)}
