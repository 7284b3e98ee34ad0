"""Single-frame R-FCN inference (the reference rfcn/ baseline test path).

Behavioral target: rfcn/core/tester.py + rfcn/function/test_rcnn.py —
every frame runs the full backbone; no key-frame state. One jitted step:
forward + proposals + PSROI scoring + per-class NMS.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lsfa_tpu.eval.detector import detect_from_maps
from lsfa_tpu.models.rfcn import RFCN
from lsfa_tpu.ops.anchors import anchor_grid


def rfcn_from_config(cfg):
    n = cfg.network
    return RFCN(
        num_classes=cfg.dataset.NUM_CLASSES,
        num_reg_classes=2 if cfg.CLASS_AGNOSTIC else cfg.dataset.NUM_CLASSES,
        feat_dim=n.DFF_FEAT_DIM,
        num_layer=n.num_layer,
        num_anchors=n.NUM_ANCHORS,
        add_dcn=n.add_dcn,
        anchor_means=tuple(n.ANCHOR_MEANS),
        anchor_stds=tuple(n.ANCHOR_STDS),
        normalize_rpn=n.NORMALIZE_RPN,
        pixel_means=tuple(float(m) for m in n.PIXEL_MEANS),
        pixel_scale=float(n.PIXEL_SCALE),
        dtype=jnp.bfloat16 if cfg.tpu.compute_dtype == "bfloat16" else jnp.float32,
    )


class RFCNDetector:
    """Stateless per-frame detector."""

    def __init__(self, model, variables, cfg, image_hw):
        h, w = image_hw
        stride = cfg.network.RPN_FEAT_STRIDE
        fh, fw = h // stride, w // stride
        anchors = jnp.asarray(anchor_grid(
            fh, fw, stride, tuple(cfg.network.ANCHOR_RATIOS),
            tuple(cfg.network.ANCHOR_SCALES)))
        det_kw = dict(
            num_classes=cfg.dataset.NUM_CLASSES,
            pre_nms=cfg.TEST.RPN_PRE_NMS_TOP_N,
            post_nms=cfg.TEST.RPN_POST_NMS_TOP_N,
            rpn_nms_thresh=cfg.TEST.RPN_NMS_THRESH,
            min_size=cfg.TEST.RPN_MIN_SIZE,
            feat_stride=stride,
            max_per_image=cfg.TEST.max_per_image,
            nms_thresh=cfg.TEST.NMS,
            score_thresh=cfg.TEST.SCORE_THRESH,
            bbox_stds=tuple(cfg.TRAIN.BBOX_STDS),
            nms_tier=cfg.tpu.nms_tier,
            nms_pallas=cfg.tpu.nms_pallas,
            num_reg_classes=(2 if cfg.CLASS_AGNOSTIC
                             else cfg.dataset.NUM_CLASSES),
        )

        @jax.jit
        def step(variables, data, im_info):
            out = model.apply(variables, data)
            return detect_from_maps(out, anchors, im_info[0], **det_kw)

        self._step = step
        self.variables = variables

    def detect(self, data, im_info):
        return self._step(self.variables, jnp.asarray(data),
                          jnp.asarray(im_info))
