"""Box geometry primitives (jittable, fixed-shape).

Semantics match the reference numeric conventions exactly
(reference: lib/bbox/bbox_transform.py — the legacy Faster-R-CNN "+1"
width/height convention), because the pretrained detection heads and the
mAP oracle both assume them. All functions are pure jnp and batch-free
(vmap for batches).

Boxes are (..., 4) float arrays [x1, y1, x2, y2], inclusive corners.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_wh_ctr(boxes):
    """Width/height/center under the +1 convention."""
    w = boxes[..., 2] - boxes[..., 0] + 1.0
    h = boxes[..., 3] - boxes[..., 1] + 1.0
    cx = boxes[..., 0] + 0.5 * (w - 1.0)
    cy = boxes[..., 1] + 0.5 * (h - 1.0)
    return w, h, cx, cy


def box_area(boxes):
    w = boxes[..., 2] - boxes[..., 0] + 1.0
    h = boxes[..., 3] - boxes[..., 1] + 1.0
    return w * h


def bbox_transform(ex_rois, gt_rois, eps: float = 1e-14):
    """Regression targets taking ex_rois -> gt_rois.

    Parity target: lib/bbox/bbox_transform.py:74-100 (nonlinear_transform).
    ex_rois, gt_rois: (N, 4) -> (N, 4) [dx, dy, dw, dh].
    """
    ew, eh, ecx, ecy = box_wh_ctr(ex_rois)
    gw, gh, gcx, gcy = box_wh_ctr(gt_rois)
    dx = (gcx - ecx) / (ew + eps)
    dy = (gcy - ecy) / (eh + eps)
    dw = jnp.log(gw / ew)
    dh = jnp.log(gh / eh)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def bbox_pred(boxes, deltas):
    """Apply predicted deltas to boxes.

    Parity target: lib/bbox/bbox_transform.py:103-140 (nonlinear_pred).
    boxes: (N, 4); deltas: (N, 4*K) -> (N, 4*K).
    """
    w, h, cx, cy = box_wh_ctr(boxes)
    shp = deltas.shape[:-1] + (-1, 4)
    d = deltas.reshape(shp)
    pcx = d[..., 0] * w[..., None] + cx[..., None]
    pcy = d[..., 1] * h[..., None] + cy[..., None]
    pw = jnp.exp(d[..., 2]) * w[..., None]
    ph = jnp.exp(d[..., 3]) * h[..., None]
    out = jnp.stack(
        [
            pcx - 0.5 * (pw - 1.0),
            pcy - 0.5 * (ph - 1.0),
            pcx + 0.5 * (pw - 1.0),
            pcy + 0.5 * (ph - 1.0),
        ],
        axis=-1,
    )
    return out.reshape(deltas.shape)


def clip_boxes(boxes, im_hw):
    """Clip boxes (and class-expanded box arrays) to image bounds.

    Parity target: lib/bbox/bbox_transform.py:45-60 — clamp to
    [0, W-1] x [0, H-1]. im_hw: (height, width) scalars or array (2,).
    """
    h = im_hw[0]
    w = im_hw[1]
    shp = boxes.shape
    b = boxes.reshape(shp[:-1] + (-1, 4))
    x1 = jnp.clip(b[..., 0], 0, w - 1.0)
    y1 = jnp.clip(b[..., 1], 0, h - 1.0)
    x2 = jnp.clip(b[..., 2], 0, w - 1.0)
    y2 = jnp.clip(b[..., 3], 0, h - 1.0)
    return jnp.stack([x1, y1, x2, y2], axis=-1).reshape(shp)


def iou_transform(ex_rois, gt_rois):
    """IoU-loss regression target = the gt box itself
    (parity: lib/bbox/bbox_transform.py:143-146)."""
    return gt_rois


def iou_pred(boxes, deltas):
    """IoU-loss decoding: per-corner additive offsets
    (parity: lib/bbox/bbox_transform.py:149-181)."""
    shp = deltas.shape[:-1] + (-1, 4)
    d = deltas.reshape(shp)
    out = jnp.stack([
        d[..., 0] + boxes[..., 0][..., None],
        d[..., 1] + boxes[..., 1][..., None],
        d[..., 2] + boxes[..., 2][..., None],
        d[..., 3] + boxes[..., 3][..., None],
    ], axis=-1)
    return out.reshape(deltas.shape)


def pairwise_iou(boxes_a, boxes_b):
    """IoU matrix (N, M) under the +1 convention.

    Parity target: lib/bbox/bbox_transform.py:22-42 (bbox_overlaps).
    """
    ax1, ay1, ax2, ay2 = jnp.moveaxis(boxes_a, -1, 0)
    bx1, by1, bx2, by2 = jnp.moveaxis(boxes_b, -1, 0)
    iw = jnp.minimum(ax2[:, None], bx2[None, :]) - jnp.maximum(ax1[:, None], bx1[None, :]) + 1.0
    ih = jnp.minimum(ay2[:, None], by2[None, :]) - jnp.maximum(ay1[:, None], by1[None, :]) + 1.0
    inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
    area_a = box_area(boxes_a)
    area_b = box_area(boxes_b)
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)
