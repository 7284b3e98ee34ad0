#!/usr/bin/env python
"""End-to-end learn->detect smoke: overfit a tiny LSFA on one synthetic
scene, then verify the detector localizes the object (IoU + mAP).

This is the strongest dataless correctness check of the whole framework:
loader -> on-device targets -> OHEM losses -> SGD -> streaming detector ->
VID evaluator. Expected result: the trained model detects the box with
IoU > 0.5 and the evaluator reports AP ~= 1.0 for the class.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(steps=80):
    import jax
    if "--tpu" not in sys.argv:
        # default CPU (deterministic, test-suite friendly); --tpu drives
        # the same learn->detect loop on the real chip
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    import jax.numpy as jnp

    from lsfa_tpu.config import load_config
    from lsfa_tpu.eval.tester import StreamingDetector, collect_detections
    from lsfa_tpu.eval.vid_eval import vid_eval
    from lsfa_tpu.models.lsfa import lsfa_from_config
    from lsfa_tpu.train.schedule import make_optimizer
    from lsfa_tpu.train.train_step import TrainSettings, make_train_step

    cfg = load_config("configs/lsfa_tiny_smoke.yaml")
    cfg.TRAIN.RPN_PRE_NMS_TOP_N = 128
    cfg.TRAIN.RPN_POST_NMS_TOP_N = 32
    cfg.TRAIN.BATCH_ROIS_OHEM = 16
    H, W = cfg.tpu.default_bucket
    fh, fw = H // 16, W // 16

    # synthetic scene: bright box on dark bg, class 3, static video
    rng = np.random.default_rng(0)
    frame = np.full((1, H, W, 3), 40.0, np.float32)
    frame[:, 16:48, 30:86] = 210.0
    gt_box = np.asarray([30.0, 16.0, 85.0, 47.0])
    gt = np.zeros((1, 8, 5), np.float32)
    gt[0, 0] = [*gt_box, 3.0]
    gtv = np.zeros((1, 8), bool)
    gtv[0, 0] = True
    batch = {
        "data": jnp.asarray(frame), "data_ref": jnp.asarray(frame),
        "data_ref_old": jnp.asarray(frame),
        "eq_flag": jnp.ones((1,)), "eq_flag_old": jnp.ones((1,)),
        "motion_vector": jnp.zeros((1, fh, fw, 2)),
        "res_diff": jnp.zeros((1, fh, fw, 3)),
        "gt_boxes": jnp.asarray(gt), "gt_valid": jnp.asarray(gtv),
        "im_info": jnp.asarray([[H, W, 1.0]], jnp.float32),
    }

    model = lsfa_from_config(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch["data"],
                           batch["data_ref"], batch["data_ref_old"],
                           batch["eq_flag"], batch["eq_flag_old"],
                           batch["motion_vector"], batch["res_diff"])
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    settings = TrainSettings.from_config(cfg)
    opt = make_optimizer(params, base_lr=2e-3, lr_steps=[10000])
    opt_state = opt.init(params)
    step = make_train_step(model, settings, (fh, fw), opt)

    for i in range(steps):
        params, bs, opt_state, m = step(params, bs, opt_state, batch,
                                    jax.random.PRNGKey(i))
        if i % 20 == 0 or i == steps - 1:
            print(f"step {i:3d} total={float(m['total_loss']):.4f} "
                  f"rpn_acc={float(m['rpn_acc']):.3f} "
                  f"rcnn_acc={float(m['rcnn_acc']):.3f}", flush=True)

    det = StreamingDetector(model, {"params": params, "batch_stats": bs},
                            cfg, (H, W))
    d, v = det.process_frame(frame, batch["im_info"], flag=0)
    out = collect_detections(d, v)
    annotations = {0: {"labels": np.asarray([3]),
                       "boxes": gt_box[None]}}
    ap = vid_eval({0: out}, annotations, cfg.dataset.NUM_CLASSES)
    top = np.argsort(-out["scores"])[:3]
    for t in top:
        print(f"det cls={out['labels'][t]} score={out['scores'][t]:.3f} "
              f"box={np.round(out['boxes'][t], 1)}")
    print(f"gt box: {gt_box}  AP[class 3] = {ap[2]:.3f}")
    ok = np.isfinite(ap[2]) and ap[2] > 0.49
    print("OVERFIT SMOKE:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
