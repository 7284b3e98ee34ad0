"""RPN proposal generation — fully on-device, fixed shapes.

Behavioral parity target: dff_rfcn/operator_py/proposal.py:51-168 (the
reference implementation of MXNet's Proposal/MultiProposal ops):

  1. decode bbox deltas on the anchor grid (order (h, w, a)),
  2. clip to the *real* image extent (im_info), not the padded map,
  3. drop boxes with any side < min_size * im_scale,
  4. take top pre_nms_top_n by fg score,
  5. greedy NMS at `threshold`,
  6. emit post_nms_top_n rois (batch_idx, x1, y1, x2, y2), padded.

TPU redesign: steps 2-3 become score masking (no dynamic shapes); the
"use real image size instead of padded feature map sizes" crop
(proposal.py:85,115) becomes a validity mask over the padded anchor grid;
padding repeats kept rois instead of random re-draws (proposal.py:153-156)
so the op is deterministic and jittable. Scores of padded slots are -inf
so top-k never selects them.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lsfa_tpu.ops.boxes import bbox_pred, clip_boxes, iou_pred
from lsfa_tpu.ops.nms import nms_fixed


@partial(jax.jit, static_argnames=("pre_nms_top_n", "post_nms_top_n",
                                   "nms_thresh", "min_size", "feat_stride",
                                   "nms_tier", "iou_loss", "use_pallas"))
def rpn_proposals(fg_scores, bbox_deltas, anchors, im_info,
                  pre_nms_top_n: int = 6000, post_nms_top_n: int = 300,
                  nms_thresh: float = 0.7, min_size: int = 16,
                  feat_stride: int = 16, nms_tier: int = 0,
                  iou_loss: bool = False, use_pallas: bool = False):
    """Single-image proposal generation.

    Args:
      fg_scores: (H, W, A) foreground probabilities.
      bbox_deltas: (H, W, A*4) *un-normalized* deltas (apply anchor
        mean/std inverse before calling; see heads.rpn_inv_normalize).
      anchors: (H*W*A, 4) anchor grid from ops.anchors.anchor_grid.
      im_info: (3,) [im_h, im_w, im_scale] of the real (unpadded) image.
      nms_tier: if > 0, run NMS on only the top `nms_tier` of the
        pre-NMS boxes. EXACT whenever the tier yields >= post_nms_top_n
        keeps: greedy decisions inside a rank prefix depend only on that
        prefix, so the first keeps coincide with the full run's. (RPN
        score maps keep ~1/3 of boxes at thresh 0.7, so a 2048 tier
        covers 300 outputs with a ~2x margin while shrinking the
        suppression matrix ~9x.) 0 = full pre-NMS set (strict parity).
      iou_loss: decode deltas as per-corner additive offsets instead of
        the center/log-size transform — the MultiProposal op's iou_loss
        mode (multi_proposal-inl.h:152-156, IoUPredKernel at
        multi_proposal.cu:143-194).

    Returns:
      rois: (post_nms_top_n, 5) [batch0, x1, y1, x2, y2] float32.
      scores: (post_nms_top_n,) fg scores of the kept rois.
      valid: (post_nms_top_n,) bool, False on padded slots.
    """
    h, w, a = fg_scores.shape
    scores = fg_scores.reshape(-1).astype(jnp.float32)
    deltas = bbox_deltas.reshape(-1, 4).astype(jnp.float32)

    # (2) decode + clip to real image extent
    decode = iou_pred if iou_loss else bbox_pred
    proposals = decode(anchors, deltas)
    proposals = clip_boxes(proposals, im_info[:2])

    # mask anchors whose grid cell lies outside the real (unpadded) feature
    # extent — the reference crops the score map to im_info/stride instead
    real_h = (im_info[0] / feat_stride).astype(jnp.int32)
    real_w = (im_info[1] / feat_stride).astype(jnp.int32)
    cell_y = jnp.arange(h * w * a) // (w * a)
    cell_x = (jnp.arange(h * w * a) // a) % w
    in_real = (cell_y < real_h) & (cell_x < real_w)

    # (3) min-size filter at input-image scale
    ws = proposals[:, 2] - proposals[:, 0] + 1.0
    hs = proposals[:, 3] - proposals[:, 1] + 1.0
    ms = min_size * im_info[2]
    big_enough = (ws >= ms) & (hs >= ms)

    keep_mask = in_real & big_enough
    masked = jnp.where(keep_mask, scores, -jnp.inf)

    # (4) pre-NMS top-k
    k = min(pre_nms_top_n, scores.shape[0])
    if nms_tier and nms_tier < k:
        k = nms_tier
    top_scores, top_idx = jax.lax.top_k(masked, k)
    top_boxes = proposals[top_idx]
    top_valid = jnp.isfinite(top_scores)

    # (5) NMS (fixed shape; top_k output is already rank-sorted)
    keep_idx, keep_valid = nms_fixed(top_boxes, top_scores, nms_thresh,
                                     post_nms_top_n, valid=top_valid,
                                     presorted=True, use_pallas=use_pallas)
    out_boxes = top_boxes[keep_idx]
    out_scores = jnp.where(keep_valid, top_scores[keep_idx], 0.0)

    rois = jnp.concatenate(
        [jnp.zeros((post_nms_top_n, 1), jnp.float32), out_boxes], axis=1)
    return rois, out_scores, keep_valid
