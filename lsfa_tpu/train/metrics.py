"""Named training metrics — the reference's 6 EvalMetrics.

Behavioral target: dff_rfcn/core/metric.py — RPNAccMetric, RPNLogLossMetric,
RPNL1LossMetric, RCNNAccMetric, RCNNLogLossMetric, RCNNL1LossMetric, all
with ignore-label (-1) filtering. Here they are pure functions over the
train step's intermediate tensors; train_step.detection_losses computes
them in-graph and returns one scalar per metric per step. This module also
provides a host-side running-average accumulator matching the
reset/update/get EvalMetric protocol for epoch-level reporting.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lsfa_tpu.train.losses import smooth_l1


def rpn_acc(rpn_cls_logits, labels, num_anchors: int):
    a = num_anchors
    pair = jnp.stack([rpn_cls_logits[..., :a], rpn_cls_logits[..., a:]], -1)
    pred = jnp.argmax(pair, axis=-1)
    mask = labels >= 0
    return jnp.sum((pred == labels) & mask) / jnp.maximum(jnp.sum(mask), 1)


def rpn_log_loss(rpn_cls_logits, labels, num_anchors: int):
    a = num_anchors
    pair = jnp.stack([rpn_cls_logits[..., :a], rpn_cls_logits[..., a:]], -1)
    logp = jax.nn.log_softmax(pair.astype(jnp.float32), axis=-1)
    mask = labels >= 0
    lbl = jnp.clip(labels.astype(jnp.int32), 0, 1)
    nll = -jnp.take_along_axis(logp, lbl[..., None], axis=-1)[..., 0]
    return jnp.sum(jnp.where(mask, nll, 0.0)) / jnp.maximum(jnp.sum(mask), 1)


def rpn_l1_loss(deltas, targets, weights, rpn_batch: int = 256):
    return jnp.sum(weights * smooth_l1(deltas - targets, 1.0)) / rpn_batch


def rcnn_acc(cls_logits, labels):
    pred = jnp.argmax(cls_logits, axis=-1)
    mask = labels >= 0
    return jnp.sum((pred == labels) & mask) / jnp.maximum(jnp.sum(mask), 1)


def rcnn_log_loss(cls_logits, labels):
    logp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), axis=-1)
    mask = labels >= 0
    lbl = jnp.clip(labels.astype(jnp.int32), 0, cls_logits.shape[-1] - 1)
    nll = -jnp.take_along_axis(logp, lbl[..., None], axis=-1)[..., 0]
    return jnp.sum(jnp.where(mask, nll, 0.0)) / jnp.maximum(jnp.sum(mask), 1)


def rcnn_l1_loss(deltas, targets, weights, ohem_count: int = 128):
    return jnp.sum(weights * smooth_l1(deltas - targets, 1.0)) / ohem_count


class MetricAverager:
    """Host-side running averages (the EvalMetric reset/update/get cycle)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._sums: dict = {}
        self._n = 0

    def update(self, metrics: dict):
        for k, v in metrics.items():
            self._sums[k] = self._sums.get(k, 0.0) + float(v)
        self._n += 1

    def get(self) -> dict:
        return {k: v / max(self._n, 1) for k, v in self._sums.items()}
