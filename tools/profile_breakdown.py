#!/usr/bin/env python
"""Per-component timing of the LSFA inference path on the current device.

Separately times: backbone+feat_conv, FlowNet, full key forward (no
detection), cur forward (no detection), RPN proposal+NMS, PSROI+per-class
NMS — to direct kernel optimization work.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lsfa_tpu.utils.env import setup_cache

setup_cache()

import numpy as np
import jax
import jax.numpy as jnp

from lsfa_tpu.config import get_default_config
from lsfa_tpu.eval.detector import detect_from_maps
from lsfa_tpu.models.lsfa import lsfa_from_config
from lsfa_tpu.ops.anchors import anchor_grid


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    cfg = get_default_config()
    model = lsfa_from_config(cfg)
    h, w = cfg.tpu.default_bucket
    fh, fw = h // 16, w // 16
    rng = jax.random.PRNGKey(0)
    z = jnp.zeros((1, h, w, 3), jnp.float32)
    zmv = jnp.zeros((1, fh, fw, 2), jnp.float32)
    zres = jnp.zeros((1, fh, fw, 3), jnp.float32)
    variables = model.init(rng, z, z, z, jnp.ones((1,)), jnp.ones((1,)),
                           zmv, zres)
    rnd = np.random.default_rng(0)
    frame = jax.device_put(jnp.asarray(
        rnd.integers(0, 255, (1, h, w, 3), dtype=np.uint8)))
    small = jax.device_put(jnp.asarray(
        rnd.integers(0, 255, (1, h // 4, w // 4, 3), dtype=np.uint8)))
    mv = jax.device_put(jnp.asarray(
        rnd.normal(0, 1.5, (1, fh, fw, 2)).astype(np.float32)))
    res = jax.device_put(jnp.asarray(
        rnd.normal(0, 8, (1, fh, fw, 3)).astype(np.float32)))
    im_info = jnp.asarray([600.0, 936.0, 1.6])
    anchors = jnp.asarray(anchor_grid(fh, fw, 16))

    @jax.jit
    def backbone_only(variables, data):
        def run(m):
            return m.conv_feat(m.preprocess(data))
        return model.apply(variables, method=run)

    @jax.jit
    def flownet_only(variables, data):
        def run(m):
            d = m.preprocess(data)
            return m.flownet(d, d)
        return model.apply(variables, method=run)

    @jax.jit
    def key_fwd(variables, data, old_img, old_feat):
        return model.apply(variables, data, old_img, old_feat,
                           jnp.zeros((1,)), method=model.forward_key)["feat"]

    @jax.jit
    def cur_fwd(variables, small, feat, mv, res):
        return model.apply(variables, small, feat, mv, res,
                           method=model.forward_cur)["feat"]

    feat = backbone_only(variables, frame)
    old_img = model.apply(variables, method=lambda m: m.preprocess(frame))

    @jax.jit
    def detection_only(variables, data, old_img, old_feat):
        out = model.apply(variables, data, old_img, old_feat,
                          jnp.zeros((1,)), method=model.forward_key)
        return detect_from_maps(out, anchors, im_info,
                                num_classes=31,
                                pre_nms=cfg.TEST.RPN_PRE_NMS_TOP_N)

    print(f"backbone+featconv : {timeit(backbone_only, variables, frame):7.2f} ms")
    print(f"flownet           : {timeit(flownet_only, variables, frame):7.2f} ms")
    print(f"key fwd (no det)  : {timeit(key_fwd, variables, frame, old_img, feat):7.2f} ms")
    print(f"key fwd + det     : {timeit(detection_only, variables, frame, old_img, feat):7.2f} ms")
    print(f"cur fwd (no det)  : {timeit(cur_fwd, variables, small, feat, mv, res):7.2f} ms")

    # detection sub-pieces
    from lsfa_tpu.ops.nms import nms_fixed
    from lsfa_tpu.ops.proposal import rpn_proposals
    from lsfa_tpu.ops.psroi_pool import psroi_pool

    fg = jax.device_put(jnp.asarray(
        rnd.uniform(0, 1, (fh, fw, 9)).astype(np.float32)))
    deltas = jax.device_put(jnp.asarray(
        rnd.normal(0, 0.2, (fh, fw, 36)).astype(np.float32)))

    @jax.jit
    def prop(fg, deltas):
        return rpn_proposals(fg, deltas, anchors, im_info,
                             pre_nms_top_n=cfg.TEST.RPN_PRE_NMS_TOP_N)

    rois, _, _ = prop(fg, deltas)
    cls_map = jax.device_put(jnp.asarray(
        rnd.normal(0, 1, (fh, fw, 31 * 49)).astype(np.float32)))

    @jax.jit
    def pool(cls_map, rois):
        return psroi_pool(cls_map, rois, output_dim=31)

    boxes = jnp.asarray(rnd.uniform(0, 500, (300, 4)).astype(np.float32))
    scores = jnp.asarray(rnd.uniform(0, 1, (300,)).astype(np.float32))

    @jax.jit
    def class_nms(boxes, scores):
        return jax.vmap(lambda s: nms_fixed(boxes, s, 0.3, 300))(
            jnp.tile(scores, (30, 1)))

    print(f"rpn proposal+nms  : {timeit(prop, fg, deltas):7.2f} ms")
    print(f"psroi pool (cls)  : {timeit(pool, cls_map, rois):7.2f} ms")
    print(f"30-class nms      : {timeit(class_nms, boxes, scores):7.2f} ms")

    # production shapes: nms_tier as configured, batched like the scan
    tier = int(cfg.tpu.nms_tier)

    @jax.jit
    def prop_tier(fg, deltas):
        return rpn_proposals(fg, deltas, anchors, im_info,
                             pre_nms_top_n=cfg.TEST.RPN_PRE_NMS_TOP_N,
                             nms_tier=tier)

    from lsfa_tpu.eval.detector import detect_single

    def det_one(fg, dl, cm, bm):
        return detect_single(fg, dl, cm, bm, anchors, im_info,
                             num_classes=31,
                             pre_nms=cfg.TEST.RPN_PRE_NMS_TOP_N,
                             nms_tier=tier)

    det12 = jax.jit(jax.vmap(det_one))
    fg12 = jnp.tile(fg[None], (12, 1, 1, 1))
    dl12 = jnp.tile(deltas[None], (12, 1, 1, 1))
    cm12 = jnp.tile(cls_map[None], (12, 1, 1, 1))
    bbox_map = jax.device_put(jnp.asarray(
        rnd.normal(0, 1, (fh, fw, 8 * 49)).astype(np.float32)))
    bm12 = jnp.tile(bbox_map[None], (12, 1, 1, 1))
    print(f"prop+nms tier{tier} : {timeit(prop_tier, fg, deltas):7.2f} ms")
    print(f"det x12 (tier)    : {timeit(det12, fg12, dl12, cm12, bm12):7.2f} ms")


if __name__ == "__main__":
    main()
