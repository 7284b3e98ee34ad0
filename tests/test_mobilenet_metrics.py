import numpy as np
import jax
import jax.numpy as jnp

from lsfa_tpu.models.mobilenet import MobileNetV2Backbone
from lsfa_tpu.train.metrics import (
    MetricAverager,
    rcnn_acc,
    rcnn_log_loss,
    rpn_acc,
    rpn_log_loss,
)


def test_mobilenet_stride16():
    bb = MobileNetV2Backbone(width=1.0)
    x = jnp.zeros((1, 64, 96, 3))
    v = bb.init(jax.random.PRNGKey(0), x)
    out = bb.apply(v, jnp.ones((1, 64, 96, 3)))[0]
    assert out.shape[:3] == (1, 4, 6)          # stride 16 via dilation
    assert np.isfinite(np.asarray(out)).all()


def test_mobilenet_hobot_variant():
    bb = MobileNetV2Backbone(width=1.0, relu6=False)
    x = jnp.zeros((1, 32, 32, 3))
    v = bb.init(jax.random.PRNGKey(0), x)
    out = bb.apply(v, jnp.ones((1, 32, 32, 3)))[0]
    assert out.shape[1] == 2


def test_metrics_ignore_label():
    logits = jnp.asarray([[2.0, 0.0], [0.0, 2.0], [9.0, 0.0]])
    labels = jnp.asarray([0.0, 1.0, -1.0])     # third ignored
    assert float(rcnn_acc(logits, labels)) == 1.0
    ll = float(rcnn_log_loss(logits, labels))
    assert 0 < ll < 0.2


def test_rpn_metrics_layout():
    # (B=1, H=1, W=2, 2A) with A=2: [bg a0, bg a1 | fg a0, fg a1]
    logits = jnp.zeros((1, 1, 2, 4)).at[..., 2].set(3.0)  # fg wins for a0
    labels = jnp.full((1, 1, 2, 2), -1.0).at[0, 0, 0, 0].set(1.0)
    assert float(rpn_acc(logits, labels, num_anchors=2)) == 1.0
    assert float(rpn_log_loss(logits, labels, num_anchors=2)) < 0.1


def test_metric_averager():
    m = MetricAverager()
    m.update({"a": 1.0})
    m.update({"a": 3.0})
    assert m.get()["a"] == 2.0
    m.reset()
    assert m.get() == {}
