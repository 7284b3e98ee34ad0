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


def test_mobilenet_lsfa_config_selectable():
    """nettype plumbing (resnet_v1_101_flownet_rfcn.py:33-40): a config
    with nettype=mobilenet must build an LSFA whose backbone is the
    MobileNetV2 trunk, and its key-frame forward must run."""
    import jax
    import jax.numpy as jnp
    from lsfa_tpu.config import get_default_config
    from lsfa_tpu.models.lsfa import lsfa_from_config

    cfg = get_default_config()
    cfg.network.nettype = "mobilenet"
    cfg.network.DFF_FEAT_DIM = 64
    cfg.network.add_dcn = False
    cfg.network.add_small_net = False   # mobilenet has no need_part plumbing
    cfg.tpu.compute_dtype = "float32"
    model = lsfa_from_config(cfg)
    H = W = 64
    data = jnp.zeros((1, H, W, 3))
    mv = jnp.zeros((1, H // 16, W // 16, 2))
    res = jnp.zeros((1, H // 16, W // 16, 3))
    v = model.init(jax.random.PRNGKey(0), data, data, data,
                   jnp.ones((1,)), jnp.ones((1,)), mv, res)
    assert "block6_0" in v["params"]["backbone"], "not a MobileNetV2 trunk"
    out = model.apply(v, data, data,
                      jnp.zeros((1, H // 16, W // 16, 64)), jnp.ones((1,)),
                      method=model.forward_key)
    assert out["feat"].shape == (1, H // 16, W // 16, 64)
    import numpy as np
    assert np.isfinite(np.asarray(out["feat"])).all()


def test_mobilenet_lsfa_small_net_rejected():
    import pytest as _pytest
    from lsfa_tpu.models.lsfa import LSFA
    import jax, jax.numpy as jnp
    m = LSFA(nettype="mobilenet", add_small_net=True, feat_dim=64,
             add_dcn=False)
    with _pytest.raises(ValueError, match="small_net"):
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
               jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)),
               jnp.ones((1,)), jnp.ones((1,)),
               jnp.zeros((1, 4, 4, 2)), jnp.zeros((1, 4, 4, 3)))
