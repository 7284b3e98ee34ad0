"""Bounded-delta guarantees for the config-gated MV/residual payload
dtype (cfg.tpu.mv_res_dtype).

The reference ships float32 MV/residual everywhere; this port defaults to
float16 payloads (half the host->device traffic + an axon-runtime fault
workaround — see data.loader.payload_dtype). These tests bound the
numerical consequence of that choice on both the eval and train paths,
and verify the config plumbing reaches every producer.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lsfa_tpu.config import get_default_config, load_config


def test_payload_dtype_plumbing_collate():
    from lsfa_tpu.data.loader import collate_train_batch, payload_dtype

    cfg = get_default_config()
    assert payload_dtype(cfg) == np.float16
    cfg.tpu.mv_res_dtype = "float32"
    assert payload_dtype(cfg) == np.float32

    sample = {
        "data": np.zeros((1, 32, 48, 3), np.float32),
        "data_ref": np.zeros((1, 32, 48, 3), np.float32),
        "data_ref_old": np.zeros((1, 32, 48, 3), np.float32),
        "motion_vector": np.zeros((1, 2, 3, 2), np.float32),
        "res_diff": np.zeros((1, 2, 3, 3), np.float32),
        "eq_flag": 0.0, "eq_flag_old": 0.0,
        "im_info": np.asarray([32, 48, 1.0], np.float32),
        "gt_boxes": np.zeros((0, 5), np.float32),
    }
    b16 = collate_train_batch([sample], (32, 48), 4)
    assert b16["motion_vector"].dtype == np.float16
    b32 = collate_train_batch([sample], (32, 48), 4,
                              mv_res_dtype=np.float32)
    assert b32["motion_vector"].dtype == np.float32
    assert b32["res_diff"].dtype == np.float32


@pytest.fixture(scope="module")
def tiny_det():
    from lsfa_tpu.eval.tester import StreamingDetector
    from lsfa_tpu.train.driver import init_model

    cfg = load_config("configs/lsfa_tiny_smoke.yaml")
    model, params, bs = init_model(cfg)
    variables = {"params": params, "batch_stats": bs}
    det = StreamingDetector(model, variables, cfg,
                            tuple(cfg.tpu.default_bucket))
    return cfg, det


def test_eval_f16_vs_f32_payload_bounded(tiny_det):
    """Same frame through the non-key program with f32 vs f16 MV/residual:
    detection scores and boxes must agree within tight bounds (the f16
    cast perturbs inputs by <= 2^-11 relative)."""
    cfg, det = tiny_det
    h, w = cfg.tpu.default_bucket
    fh, fw = h // 16, w // 16
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (1, h, w, 3)).astype(np.uint8)
    im_info = np.asarray([[h - 4, w - 8, 1.0]], np.float32)
    # realistic magnitudes: MV spans a few grid cells, residual ~ +-100
    mv32 = rng.normal(0, 1.5, (1, fh, fw, 2)).astype(np.float32)
    res32 = rng.normal(0, 40, (1, fh, fw, 3)).astype(np.float32)

    det.reset()
    det.process_frame(frame, im_info, flag=0)        # establish key state
    d32, v32 = det.process_frame(None, im_info, motion_vector=mv32,
                                 res_diff=res32, flag=2,
                                 small=frame[:, ::4, ::4].astype(np.float32))
    d16, v16 = det.process_frame(None, im_info,
                                 motion_vector=mv32.astype(np.float16),
                                 res_diff=res32.astype(np.float16), flag=2,
                                 small=frame[:, ::4, ::4].astype(np.float32))
    d32, d16 = np.asarray(d32)[0], np.asarray(d16)[0]
    v32, v16 = np.asarray(v32)[0], np.asarray(v16)[0]
    # same detection count and labels
    assert v32.sum() == v16.sum()
    k = v32 & v16
    assert (d32[k, 0] == d16[k, 0]).all()
    # scores within 1e-2 absolute, boxes within 2px
    assert np.abs(d32[k, 1] - d16[k, 1]).max() < 1e-2
    assert np.abs(d32[k, 2:6] - d16[k, 2:6]).max() < 2.0


def test_train_f16_vs_f32_payload_loss_delta():
    """One full train step with f32 vs f16 MV/residual payloads: every
    reported metric must agree to ~1% relative (train-path equivalence of
    the shipped f16 default)."""
    from lsfa_tpu.models.lsfa import LSFA
    from lsfa_tpu.train.schedule import make_optimizer
    from lsfa_tpu.train.train_step import TrainSettings, make_train_step

    H, W = 64, 96
    FH, FW = H // 16, W // 16
    model = LSFA(num_classes=5, feat_dim=64, num_layer=18, add_dcn=False,
                 add_small_net=True, add_Nq_net=True, rnet_num_conv=0)
    rng = jax.random.PRNGKey(0)
    data = jnp.zeros((1, H, W, 3))
    mv = jnp.zeros((1, FH, FW, 2))
    res = jnp.zeros((1, FH, FW, 3))
    ones = jnp.ones((1,))
    variables = model.init(rng, data, data, data, ones, ones, mv, res)

    cfg = get_default_config()
    settings = TrainSettings.from_config(cfg)
    settings = type(settings)(**{**settings.__dict__, "num_classes": 5,
                                 "pre_nms_top_n": 64, "post_nms_top_n": 16,
                                 "rpn_batch": 32, "ohem_rois": 8})
    nprng = np.random.default_rng(1)
    gt = np.zeros((1, 8, 5), np.float32)
    gt[:, 0] = [8.0, 8.0, 44.0, 44.0, 1.0]
    gtv = np.zeros((1, 8), bool)
    gtv[:, 0] = True
    base = {
        "data": nprng.normal(0, 50, (1, H, W, 3)).astype(np.float32),
        "data_ref": nprng.normal(0, 50, (1, H, W, 3)).astype(np.float32),
        "data_ref_old": nprng.normal(0, 50, (1, H, W, 3)).astype(np.float32),
        "eq_flag": np.zeros((1,), np.float32),
        "eq_flag_old": np.zeros((1,), np.float32),
        "gt_boxes": gt, "gt_valid": gtv,
        "im_info": np.asarray([[H, W, 1.0]], np.float32),
    }
    mv32 = nprng.normal(0, 1.5, (1, FH, FW, 2)).astype(np.float32)
    res32 = nprng.normal(0, 40, (1, FH, FW, 3)).astype(np.float32)

    opt = make_optimizer(variables["params"], base_lr=1e-3, lr_steps=[1000])
    metrics = {}
    for name, dt in (("f32", np.float32), ("f16", np.float16)):
        params = jax.tree.map(jnp.array, variables["params"])
        bs = jax.tree.map(jnp.array, variables.get("batch_stats", {}))
        step = make_train_step(model, settings, (FH, FW), opt)
        batch = dict(base, motion_vector=mv32.astype(dt),
                     res_diff=res32.astype(dt))
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        _, _, _, m = step(params, bs, opt.init(params), batch,
                          jax.random.PRNGKey(5))
        metrics[name] = {k: float(v) for k, v in m.items()}
    for k, v32 in metrics["f32"].items():
        v16 = metrics["f16"][k]
        assert abs(v16 - v32) <= max(1e-3, 0.02 * abs(v32)), \
            (k, v32, v16)
