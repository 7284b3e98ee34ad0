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
    """Faithful Hobot trunk (mobilenetv2_hobot.py:16-264): 17 bottleneck
    blocks, bottleneck1 (t=1) KEEPS its 1x1 expansion conv, no 1280 head
    conv (320-ch output), stride 16 via an undilated stride-1 res5."""
    from lsfa_tpu.models.mobilenet import MobileNetV2HobotBackbone

    bb = MobileNetV2HobotBackbone(width=1.0)
    x = jnp.zeros((1, 64, 96, 3))
    v = bb.init(jax.random.PRNGKey(0), x)
    p = v["params"]
    assert set(k for k in p if k.startswith("bottleneck")) == {
        f"bottleneck{i}" for i in range(1, 18)}
    # t=1 block still has the pointwise expansion (reference :31-49
    # builds it unconditionally; standard MBV2 skips it)
    assert "expand" in p["bottleneck1"]
    assert p["bottleneck1"]["expand"]["kernel"].shape == (1, 1, 32, 32)
    assert "head" not in p                     # no 1280 head conv (:257)
    out = bb.apply(v, jnp.ones((1, 64, 96, 3)))[0]
    assert out.shape == (1, 4, 6, 320)         # stride 16, 320 channels
    assert np.isfinite(np.asarray(out)).all()
    # res5 runs stride-1 UNDILATED (reference :226-233 flips the stride
    # only; there is no dilated variant)
    assert p["bottleneck14"]["dw"]["kernel"].shape[:2] == (3, 3)


def test_hobot_lsfa_selectable():
    """nettype='mobilenet_hobot' builds the faithful trunk inside LSFA."""
    from lsfa_tpu.models.lsfa import LSFA

    m = LSFA(nettype="mobilenet_hobot", add_small_net=False, feat_dim=64,
             add_dcn=False)
    data = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), data, data, data,
               jnp.ones((1,)), jnp.ones((1,)),
               jnp.zeros((1, 4, 4, 2)), jnp.zeros((1, 4, 4, 3)))
    bb = v["params"]["backbone"]
    assert "bottleneck17" in bb and "head" not in bb
    out = m.apply(v, data, data, jnp.zeros((1, 4, 4, 64)), jnp.ones((1,)),
                  method=m.forward_key)
    assert out["feat"].shape == (1, 4, 4, 64)
    assert np.isfinite(np.asarray(out["feat"])).all()


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
