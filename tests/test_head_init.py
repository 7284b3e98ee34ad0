"""New-head initialization parity: the reference seeds every non-pretrained
head with Normal(0, 0.01) weights + zero bias (init_weight,
resnet_v1_101_flownet_rfcn.py:763-868). flax's default lecun_normal is
~58x larger for the R-net's 3-channel 1x1 conv, whose output is ADDED to
backbone features — from-scratch rungs diverged on it (round-4 ladder).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lsfa_tpu.models.aggregation import NqNet, RNet


@pytest.fixture(scope="module")
def lsfa_params():
    from lsfa_tpu.models.lsfa import LSFA
    m = LSFA(num_classes=3, feat_dim=32, num_layer=18, add_dcn=False,
             rnet_num_conv=1)
    d = jnp.zeros((1, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), d, d, d, jnp.ones((1,)),
               jnp.ones((1,)), jnp.zeros((1, 2, 2, 2)),
               jnp.zeros((1, 2, 2, 3)))
    return v["params"]


def _std(p):
    return float(np.asarray(p).std())


def test_new_heads_init_std_001(lsfa_params):
    p = lsfa_params
    for mod in ("feat_conv_3x3", "rpn_cls_score", "rpn_bbox_pred",
                "rfcn_cls", "rfcn_bbox"):
        assert 0.005 < _std(p[mod]["kernel"]) < 0.015, mod
        assert np.all(np.asarray(p[mod]["bias"]) == 0.0), mod
    assert 0.005 < _std(p["rnet"]["conv0"]["kernel"]) < 0.015
    for c in ("conv1", "conv2", "conv3"):
        assert 0.005 < _std(p["nq_net"][c]["kernel"]) < 0.015, c


def test_backbone_keeps_lecun(lsfa_params):
    # the backbone is ALWAYS pretrained in the recipe; its from-scratch
    # fallback keeps the sane lecun default, not the head init
    k = lsfa_params["backbone"]["stage1_unit1"]["conv1"]["kernel"]
    fan_in = k.shape[0] * k.shape[1] * k.shape[2]
    lecun = 1.0 / np.sqrt(fan_in)
    assert 0.5 * lecun < _std(k) < 2.0 * lecun
