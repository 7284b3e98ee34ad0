"""End-to-end training-step tests on tiny shapes (single device + mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lsfa_tpu.config import get_default_config
from lsfa_tpu.models.lsfa import LSFA
from lsfa_tpu.train.schedule import make_optimizer, warmup_multifactor
from lsfa_tpu.train.train_step import TrainSettings, make_train_step

H, W = 64, 96
FH, FW = H // 16, W // 16


@pytest.fixture(scope="module")
def setup():
    model = LSFA(num_classes=5, feat_dim=64, num_layer=18, add_dcn=False,
                 add_small_net=True, add_Nq_net=True, rnet_num_conv=0)
    rng = jax.random.PRNGKey(0)
    data = jnp.zeros((2, H, W, 3))
    mv = jnp.zeros((2, FH, FW, 2))
    res = jnp.zeros((2, FH, FW, 3))
    ones = jnp.ones((2,))
    variables = model.init(rng, data, data, data, ones, ones, mv, res)
    cfg = get_default_config()
    settings = TrainSettings.from_config(cfg)
    settings = type(settings)(**{**settings.__dict__,
                                 "num_classes": 5,
                                 "pre_nms_top_n": 64, "post_nms_top_n": 16,
                                 "rpn_batch": 32, "ohem_rois": 8})
    return model, variables, settings


def make_batch(b=2):
    rng = np.random.default_rng(0)
    gt = np.zeros((b, 8, 5), np.float32)
    gt[:, 0] = [8.0, 8.0, 44.0, 44.0, 1.0]
    gt[:, 1] = [30.0, 20.0, 80.0, 60.0, 3.0]
    gtv = np.zeros((b, 8), bool)
    gtv[:, :2] = True
    return {
        "data": jnp.asarray(rng.normal(0, 50, (b, H, W, 3)).astype(np.float32)),
        "data_ref": jnp.asarray(rng.normal(0, 50, (b, H, W, 3)).astype(np.float32)),
        "data_ref_old": jnp.asarray(rng.normal(0, 50, (b, H, W, 3)).astype(np.float32)),
        "eq_flag": jnp.zeros((b,)),
        "eq_flag_old": jnp.zeros((b,)),
        "motion_vector": jnp.zeros((b, FH, FW, 2)),
        "res_diff": jnp.asarray(
            rng.normal(0, 5, (b, FH, FW, 3)).astype(np.float32)),
        "gt_boxes": jnp.asarray(gt),
        "gt_valid": jnp.asarray(gtv),
        "im_info": jnp.tile(jnp.asarray([[H, W, 1.0]], jnp.float32), (b, 1)),
    }


def _copy(tree):
    # the train step DONATES params/stats/opt_state; tests sharing the
    # module-scoped fixture must hand it a private copy
    return jax.tree.map(jnp.array, tree)


def test_train_step_runs_and_updates(setup):
    model, variables, settings = setup
    params = _copy(variables["params"])
    bs = _copy(variables.get("batch_stats", {}))
    opt = make_optimizer(params, base_lr=1e-3, lr_steps=[1000])
    opt_state = opt.init(params)
    step = make_train_step(model, settings, (FH, FW), opt)
    batch = make_batch()

    p0_head = np.asarray(params["rfcn_cls"]["kernel"]).copy()
    p0_frozen = np.asarray(
        params["backbone"]["stage1_unit1"]["conv1"]["kernel"]).copy()
    losses = []
    p, o = params, opt_state
    for i in range(3):
        p, bs, o, m = step(p, bs, o, batch, jax.random.PRNGKey(i))
        for k, v in m.items():
            assert np.isfinite(float(v)), (k, v)
        losses.append(float(m["total_loss"]))
    # trainable head moved, frozen stage-1 did not
    assert not np.allclose(np.asarray(p["rfcn_cls"]["kernel"]), p0_head)
    np.testing.assert_array_equal(
        np.asarray(p["backbone"]["stage1_unit1"]["conv1"]["kernel"]), p0_frozen)
    # optimizing the same batch must reduce the loss
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("variant", ["res_diff_bn", "small_net_bn"])
def test_train_step_bn_variants(variant):
    """Config switches that put TRAIN-MODE BatchNorms in the graph
    (res_diff_bn — resnet_v1_101_flownet_rfcn.py:61-63; small_net
    bn_before_fuse — :232-244) must train AND update their moving stats."""
    kw = dict(num_classes=5, feat_dim=64, num_layer=18, add_dcn=False,
              add_small_net=True, add_Nq_net=True, rnet_num_conv=1)
    if variant == "res_diff_bn":
        kw["res_diff_bn"] = True
        stat_path = ("rnet", "bn", "BatchNorm_0", "mean")
    else:
        kw["small_net_bn_before_fuse"] = True
        stat_path = ("small_fuse", "cur_feat_bn", "BatchNorm_0", "mean")
    model = LSFA(**kw)
    rng = jax.random.PRNGKey(0)
    data = jnp.zeros((2, H, W, 3))
    mv = jnp.zeros((2, FH, FW, 2))
    res = jnp.zeros((2, FH, FW, 3))
    ones = jnp.ones((2,))
    variables = model.init(rng, data, data, data, ones, ones, mv, res)
    params = variables["params"]
    bs = variables["batch_stats"]
    node = bs
    for k in stat_path[:-1]:
        node = node[k]
    before = np.asarray(node[stat_path[-1]]).copy()

    cfg = get_default_config()
    settings = TrainSettings.from_config(cfg)
    settings = type(settings)(**{**settings.__dict__, "num_classes": 5,
                                 "pre_nms_top_n": 64, "post_nms_top_n": 16,
                                 "rpn_batch": 32, "ohem_rois": 8})
    opt = make_optimizer(params, base_lr=1e-3, lr_steps=[1000])
    opt_state = opt.init(params)
    step = make_train_step(model, settings, (FH, FW), opt)
    batch = make_batch()
    params, bs, opt_state, m = step(params, bs, opt_state, batch,
                                    jax.random.PRNGKey(1))
    assert np.isfinite(float(m["total_loss"]))
    node = bs
    for k in stat_path[:-1]:
        node = node[k]
    after = np.asarray(node[stat_path[-1]])
    assert not np.allclose(after, before), "train-mode BN stats did not move"


def test_train_step_batch_rois_no_ohem(setup):
    """The BATCH_ROIS > 0 recipe (ENABLE_OHEM=False): fixed fg/bg sampled
    minibatch, losses normalized by BATCH_ROIS (reference :433-436)."""
    model, variables, settings = setup
    params = _copy(variables["params"])
    bs = _copy(variables.get("batch_stats", {}))
    settings = type(settings)(**{**settings.__dict__,
                                 "enable_ohem": False, "batch_rois": 16,
                                 "fg_fraction": 0.25})
    opt = make_optimizer(params, base_lr=1e-3, lr_steps=[1000])
    opt_state = opt.init(params)
    step = make_train_step(model, settings, None, opt)
    batch = make_batch()
    head0 = np.asarray(params["rfcn_cls"]["kernel"]).copy()
    p, bs2, o, m = step(params, bs, opt_state, batch, jax.random.PRNGKey(0))
    for k, v in m.items():
        assert np.isfinite(float(v)), (k, v)
    assert not np.allclose(np.asarray(p["rfcn_cls"]["kernel"]), head0)


def test_lr_schedule():
    sched = warmup_multifactor(0.1, [10, 20], factor=0.1,
                               warmup=True, warmup_lr=0.01, warmup_step=5)
    np.testing.assert_allclose(float(sched(0)), 0.01)
    np.testing.assert_allclose(float(sched(4)), 0.01 + (0.1 - 0.01) * 4 / 5)
    np.testing.assert_allclose(float(sched(5)), 0.1)
    np.testing.assert_allclose(float(sched(10)), 0.01)
    np.testing.assert_allclose(float(sched(25)), 0.001, rtol=1e-6)


def test_train_step_per_class_regression(setup):
    """CLASS_AGNOSTIC=false end-to-end: a head with 4*num_classes
    regression channels trains with class-expanded targets (finite
    losses, head updates)."""
    model_a, _, settings = setup
    model = LSFA(num_classes=5, num_reg_classes=5, feat_dim=64,
                 num_layer=18, add_dcn=False, add_small_net=True,
                 add_Nq_net=True, rnet_num_conv=0)
    rng = jax.random.PRNGKey(1)
    data = jnp.zeros((2, H, W, 3))
    mv = jnp.zeros((2, FH, FW, 2))
    res = jnp.zeros((2, FH, FW, 3))
    ones = jnp.ones((2,))
    variables = model.init(rng, data, data, data, ones, ones, mv, res)
    assert variables["params"]["rfcn_bbox"]["kernel"].shape[-1] == 4 * 5 * 49
    settings = type(settings)(**{**settings.__dict__, "num_reg_classes": 5})
    params = _copy(variables["params"])
    bs = _copy(variables.get("batch_stats", {}))
    opt = make_optimizer(params, base_lr=1e-3, lr_steps=[1000])
    step = make_train_step(model, settings, (FH, FW), opt)
    batch = make_batch()
    p, bs2, o, m = step(params, bs, opt.init(params), batch,
                        jax.random.PRNGKey(0))
    for k, v in m.items():
        assert np.isfinite(float(v)), (k, v)
    assert float(m["rcnn_bbox_loss"]) > 0
