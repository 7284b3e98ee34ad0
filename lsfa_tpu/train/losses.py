"""Loss primitives matching the reference's MXNet op semantics."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1(x, sigma: float = 1.0):
    """MXNet smooth_l1 with `scalar` sigma:
    f(x) = 0.5 (sigma x)^2          if |x| < 1/sigma^2
         = |x| - 0.5 / sigma^2      otherwise."""
    s2 = sigma * sigma
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0 / s2, 0.5 * s2 * x * x, ax - 0.5 / s2)


def softmax_ce_ignore(logits, labels, ignore_label: int = -1):
    """Softmax cross-entropy with an ignore label and 'valid' normalization
    (MXNet SoftmaxOutput(use_ignore, normalization='valid')).

    logits: (..., C); labels: (...,) float/int.
    Returns (total_loss_scalar, per_example_loss, valid_mask)."""
    labels_i = labels.astype(jnp.int32)
    mask = labels_i != ignore_label
    safe = jnp.clip(labels_i, 0, logits.shape[-1] - 1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(mask, nll, 0.0)
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(nll) / denom, nll, mask


def rpn_losses(rpn_cls_logits, rpn_bbox_deltas, labels, bbox_targets,
               bbox_weights, num_anchors: int, rpn_batch: int = 256,
               normalized: bool = True):
    """RPN classification + smooth-L1 losses.

    Parity: reference train symbol :350-364 — CE with ignore -1 normalized
    by #labeled anchors; bbox smooth_l1 (sigma 1 when NORMALIZE_RPN else 3)
    scaled by 1/RPN_BATCH_SIZE.

    rpn_cls_logits: (B, H, W, 2A) [bg A | fg A]; labels: (B, H, W, A);
    deltas/targets/weights: (B, H, W, 4A).
    """
    a = num_anchors
    pair = jnp.stack([rpn_cls_logits[..., :a], rpn_cls_logits[..., a:]], axis=-1)
    cls_loss, _, _ = softmax_ce_ignore(pair, labels)
    sigma = 1.0 if normalized else 3.0
    l1 = bbox_weights * smooth_l1(rpn_bbox_deltas - bbox_targets, sigma)
    bbox_loss = jnp.sum(l1) / (rpn_batch * max(labels.shape[0], 1))
    return cls_loss, bbox_loss


def rcnn_losses(cls_logits, bbox_deltas, labels, bbox_targets, bbox_weights,
                ohem_count: int = 128):
    """RCNN head losses after OHEM (reference :429-431): CE normalized
    'valid', bbox smooth_l1 scaled by 1/BATCH_ROIS_OHEM per image."""
    cls_loss, _, _ = softmax_ce_ignore(cls_logits, labels)
    l1 = bbox_weights * smooth_l1(bbox_deltas - bbox_targets, 1.0)
    batch = labels.shape[0] if labels.ndim > 1 else 1
    bbox_loss = jnp.sum(l1) / (ohem_count * batch)
    return cls_loss, bbox_loss
