"""Warm-starting LSFA from a trained single-frame R-FCN checkpoint.

cfg.network.pretrained_detector points init_model at the orbax checkpoint
of a detector run (the ablation ladder's rfcn rung); the shared detection
stack (backbone, feat_conv_3x3, RPN, R-FCN heads + BN stats) transfers by
name+shape while the aggregation modules (flownet/rnet/small/Nq) stay at
fresh init — the in-environment analog of the reference's pretrained
ResNet + combine_model recipe (dff_rfcn/train_end2end.py:107-115).
"""

import numpy as np
import jax
import pytest

from lsfa_tpu.config import load_config
from lsfa_tpu.train.checkpoint import save_checkpoint
from lsfa_tpu.train.driver import init_model
from lsfa_tpu.train.schedule import make_optimizer


@pytest.fixture(scope="module")
def det_ckpt(tmp_path_factory):
    """A 'trained' rfcn-tiny checkpoint: fresh init with every float leaf
    shifted by +1 so transferred tensors are distinguishable from the
    lsfa init (which uses a different RNG path anyway)."""
    cfg = load_config("configs/rfcn_tiny_smoke.yaml")
    _, params, bs = init_model(cfg)
    params = jax.tree.map(lambda x: x + 1.0, params)
    bs = jax.tree.map(lambda x: x + 1.0, bs)
    opt = make_optimizer(params, 1e-3, [100])
    path = str(tmp_path_factory.mktemp("det") / "checkpoints")
    save_checkpoint(path, 2, params, bs, opt.init(params))
    return path, params, bs


def test_warm_start_transfers_shared_stack(det_ckpt):
    path, det_params, det_bs = det_ckpt
    cfg = load_config("configs/lsfa_tiny_smoke.yaml")
    cfg.network.pretrained_detector = path
    _, params, bs = init_model(cfg)

    for mod in ("backbone", "feat_conv_3x3", "rpn_cls_score",
                "rpn_bbox_pred", "rfcn_cls", "rfcn_bbox"):
        src = jax.tree.leaves(det_params[mod])
        dst = jax.tree.leaves(params[mod])
        assert len(src) == len(dst), mod
        for a, b in zip(src, dst):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # BN running stats ride along
    for a, b in zip(jax.tree.leaves(det_bs["backbone"]),
                    jax.tree.leaves(bs["backbone"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # aggregation modules exist and are NOT +1-shifted imports
    assert "flownet" in params
    # small net is seeded from the WARM backbone (merge happens before
    # seed_small_net), so its stage-1 == the detector's stage-1
    np.testing.assert_array_equal(
        np.asarray(params["small_net_backbone"]["stage1_unit1"]["conv1"]
                   ["kernel"]),
        np.asarray(det_params["backbone"]["stage1_unit1"]["conv1"]
                   ["kernel"]))


def test_warm_start_missing_overlap_raises(det_ckpt, tmp_path):
    """A checkpoint sharing nothing with the model fails loudly."""
    path = str(tmp_path / "bogus")
    save_checkpoint(path, 1, {"not_a_module": np.zeros((2,), np.float32)},
                    {}, {})
    cfg = load_config("configs/lsfa_tiny_smoke.yaml")
    cfg.network.pretrained_detector = path
    with pytest.raises(ValueError, match="shares no parameter"):
        init_model(cfg)
