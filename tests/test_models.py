"""Model graph smoke tests on tiny shapes (resnet-18 variant for speed).

The parameter-shape/arrangement assertions here play the role of the
reference's check_parameter_shapes graph test (lib/utils/symbol.py:44-55).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lsfa_tpu.models import LSFA, RFCN, ResNetBackbone, FlowNetS

H, W = 64, 96  # tiny bucket, /16 = 4x6


def small_lsfa(**kw):
    args = dict(num_classes=5, feat_dim=64, num_layer=18, num_anchors=9,
                add_dcn=False, add_small_net=True, add_Nq_net=True,
                rnet_num_conv=0, dtype=jnp.float32)
    args.update(kw)
    return LSFA(**args)


@pytest.fixture(scope="module")
def lsfa_and_params():
    model = small_lsfa()
    rng = jax.random.PRNGKey(0)
    data = jnp.zeros((1, H, W, 3))
    mv = jnp.zeros((1, H // 16, W // 16, 2))
    res = jnp.zeros((1, H // 16, W // 16, 3))
    variables = model.init(rng, data, data, data, jnp.ones((1,)),
                           jnp.ones((1,)), mv, res)
    return model, variables


def test_backbone_stride16_parts():
    bb = ResNetBackbone(num_layer=18, inv_resolution=16)
    v = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    parts = bb.apply(v, jnp.ones((1, H, W, 3)))
    assert len(parts) == 5
    assert parts[0].shape == (1, H // 4, W // 4, 64)    # c2
    assert parts[1].shape == (1, H // 8, W // 8, 128)   # c3
    assert parts[2].shape == (1, H // 16, W // 16, 256) # c4
    assert parts[3].shape == (1, H // 16, W // 16, 512) # c5 (dilated, stride 16)
    assert parts[4].shape == parts[3].shape             # post bn-relu


def test_flownet_shapes_and_scale_init():
    fn = FlowNetS(feat_dim=64)
    a = jnp.ones((1, H, W, 3)) * 100.0
    b = jnp.ones((1, H, W, 3)) * 50.0
    v = fn.init(jax.random.PRNGKey(0), a, b)
    flow, scale = fn.apply(v, a, b)
    assert flow.shape == (1, H // 16, W // 16, 2)
    assert scale.shape == (1, H // 16, W // 16, 64)
    # scale map initializes to exactly 1 (zero weights, unit bias)
    np.testing.assert_allclose(np.asarray(scale), 1.0, atol=1e-6)


def test_lsfa_key_frame_forward(lsfa_and_params):
    model, variables = lsfa_and_params
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.normal(size=(1, H, W, 3)).astype(np.float32))
    dummy_feat = jnp.zeros((1, H // 16, W // 16, 64))
    out = model.apply(variables, data, data, dummy_feat, jnp.ones((1,)),
                      method=model.forward_key)
    fh, fw = H // 16, W // 16
    assert out["feat"].shape == (1, fh, fw, 64)
    assert out["rpn_fg"].shape == (1, fh, fw, 9)
    assert out["rpn_deltas"].shape == (1, fh, fw, 36)
    assert out["rfcn_cls_map"].shape == (1, fh, fw, 5 * 49)
    assert out["rfcn_bbox_map"].shape == (1, fh, fw, 8 * 49)
    # first frame: aggregated feature must equal the fresh feature path
    out2 = model.apply(variables, data, data, out["feat"], jnp.zeros((1,)),
                       method=model.forward_key)
    assert np.isfinite(np.asarray(out2["feat"])).all()


def test_lsfa_cur_frame_forward(lsfa_and_params):
    model, variables = lsfa_and_params
    rng = np.random.default_rng(1)
    fh, fw = H // 16, W // 16
    small = jnp.asarray(rng.normal(size=(1, H // 4, W // 4, 3)).astype(np.float32))
    feat_key = jnp.asarray(rng.normal(size=(1, fh, fw, 64)).astype(np.float32))
    mv = jnp.asarray(rng.normal(0, 1, size=(1, fh, fw, 2)).astype(np.float32))
    res = jnp.asarray(rng.normal(size=(1, fh, fw, 3)).astype(np.float32))
    out = model.apply(variables, small, feat_key, mv, res,
                      method=model.forward_cur)
    assert out["feat"].shape == (1, fh, fw, 64)
    assert np.isfinite(np.asarray(out["rpn_fg"])).all()


def test_lsfa_train_forward_eq_flag_select(lsfa_and_params):
    model, variables = lsfa_and_params
    rng = np.random.default_rng(2)
    fh, fw = H // 16, W // 16
    data = jnp.asarray(rng.normal(size=(1, H, W, 3)).astype(np.float32))
    ref = jnp.asarray(rng.normal(size=(1, H, W, 3)).astype(np.float32))
    old = jnp.asarray(rng.normal(size=(1, H, W, 3)).astype(np.float32))
    mv = jnp.zeros((1, fh, fw, 2))
    res = jnp.zeros((1, fh, fw, 3))

    def run(eq, eq_old):
        return model.apply(variables, data, ref, old,
                           jnp.full((1,), eq), jnp.full((1,), eq_old), mv, res,
                           method=model.forward_train)

    out = run(0.0, 0.0)
    assert out["rpn_cls"].shape == (1, fh, fw, 18)
    # eq_flag=1: selected feature is the key path (fresh feature)
    out_eq = run(1.0, 1.0)
    np.testing.assert_allclose(np.asarray(out_eq["sel_feat"]),
                               np.asarray(out_eq["key_feat"]), atol=1e-5)


def test_rfcn_baseline_forward():
    model = RFCN(num_classes=5, feat_dim=64, num_layer=18)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    out = model.apply(v, jnp.ones((1, H, W, 3)))
    fh, fw = H // 16, W // 16
    assert out["rpn_fg"].shape == (1, fh, fw, 9)
    assert out["rfcn_cls_map"].shape == (1, fh, fw, 5 * 49)


def test_lsfa_small_net_param_tree(lsfa_and_params):
    model, variables = lsfa_and_params
    params = variables["params"]
    # small net holds only stage-1 (c2) params — no stage2+ copies
    assert "small_net_backbone" in params
    sb = params["small_net_backbone"]
    assert any(k.startswith("stage1_") for k in sb)
    assert not any(k.startswith("stage2_") for k in sb)
    # shared dilated feature conv exists once
    assert "feat_conv_3x3" in params
