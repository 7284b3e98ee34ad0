"""Online hard example mining — jittable top-k selection.

Behavioral target: dff_rfcn/operator_py/box_annotator_ohem.py:26-53 —
per-roi loss = CE(softmax cls, label) + sum(bbox_weight * smooth_l1(pred -
target)); keep the `roi_per_img` highest-loss rois; everything else gets
label -1 and zero bbox weight. The reference runs this as a host NumPy
custom op (device->host sync per step); here it's a pure top_k on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lsfa_tpu.train.losses import smooth_l1


def ohem_select(cls_logits, bbox_deltas, labels, bbox_targets, bbox_weights,
                valid, roi_per_img: int = 128):
    """Single-image OHEM.

    Args:
      cls_logits: (N, C); bbox_deltas: (N, 8); labels: (N,);
      bbox_targets/bbox_weights: (N, 8); valid: (N,) bool.

    Returns (labels_ohem (N,), bbox_weights_ohem (N, 8)).
    """
    n, c = cls_logits.shape
    labels_i = jnp.clip(labels.astype(jnp.int32), 0, c - 1)
    logp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), axis=-1)
    cls_loss = -jnp.take_along_axis(logp, labels_i[:, None], axis=-1)[:, 0]
    box_loss = jnp.sum(bbox_weights * smooth_l1(bbox_deltas - bbox_targets, 1.0),
                       axis=1)
    per_roi = cls_loss + box_loss
    elig = valid & (labels >= 0)
    per_roi = jnp.where(elig, per_roi, -jnp.inf)

    # rank by (loss desc, index) — selects exactly the top roi_per_img
    # ELIGIBLE rois (a kth-threshold formulation would keep -inf padding
    # rois whenever fewer than roi_per_img eligible rois exist)
    order = jnp.argsort(-per_roi, stable=True)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    keep = elig & (rank < roi_per_img)

    labels_ohem = jnp.where(keep, labels, -1.0)
    bbox_weights_ohem = jnp.where(keep[:, None], bbox_weights, 0.0)
    return labels_ohem, bbox_weights_ohem
