#!/usr/bin/env python
"""Ablate the detection stage inside key_step to attribute device time.

Variants (all jitted, latency = block every call):
  fwd         forward only (maps out)
  +prop       forward + proposal (incl. RPN NMS at pre_nms=N)
  +psroi      ... + PSROI scoring
  full        ... + per-class NMS + top-k  (== production)
Also sweeps pre_nms in {6000, 2048, 1024}.
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
from lsfa_tpu.eval.detector import postprocess_detections
from lsfa_tpu.models.lsfa import lsfa_from_config
from lsfa_tpu.ops.anchors import anchor_grid
from lsfa_tpu.ops.proposal import rpn_proposals
from lsfa_tpu.ops.psroi_pool import psroi_pool


def lat(fn, *args, n=10):
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
    z = jnp.zeros((1, h, w, 3), jnp.float32)
    zmv = jnp.zeros((1, fh, fw, 2), jnp.float32)
    zres = jnp.zeros((1, fh, fw, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), z, z, z, jnp.ones((1,)),
                           jnp.ones((1,)), zmv, zres)
    rnd = np.random.default_rng(0)
    frame = jax.device_put(jnp.asarray(
        rnd.integers(0, 255, (1, h, w, 3), dtype=np.uint8)))
    im_info = jnp.asarray([600.0, 936.0, 1.6])
    anchors = jnp.asarray(anchor_grid(fh, fw, 16))
    dummy = jnp.zeros((1, fh, fw, 1024))

    def fwd(variables, data, old_img, old_feat):
        return model.apply(variables, data, old_img, old_feat,
                           jnp.zeros((1,)), method=model.forward_key)

    @jax.jit
    def v_fwd(variables, data, old_img, old_feat):
        o = fwd(variables, data, old_img, old_feat)
        return o["rpn_fg"], o["rfcn_cls_map"]

    def make_variant(pre_nms, upto):
        @jax.jit
        def step(variables, data, old_img, old_feat):
            o = fwd(variables, data, old_img, old_feat)
            rois, scores, valid = rpn_proposals(
                o["rpn_fg"][0], o["rpn_deltas"][0], anchors, im_info,
                pre_nms_top_n=pre_nms)
            if upto == "prop":
                return rois
            pc = psroi_pool(o["rfcn_cls_map"][0], rois, output_dim=31)
            pb = psroi_pool(o["rfcn_bbox_map"][0], rois, output_dim=8)
            cls = jax.nn.softmax(jnp.mean(pc, (1, 2)), -1)
            deltas = jnp.mean(pb, (1, 2))
            if upto == "psroi":
                return cls, deltas
            return postprocess_detections(cls, deltas, rois, valid, im_info,
                                          num_classes=31)
        return step

    out = fwd(variables, frame, model.apply(
        variables, method=lambda m: m.preprocess(frame)), dummy)
    old_img = model.apply(variables, method=lambda m: m.preprocess(frame))
    feat = out["feat"]

    # each variant recompiles the full flagship graph (~1-2 min on the
    # tunnel host); the default sweep keeps 3 compiles — pass --full for
    # the complete pre_nms ladder (7 compiles, ~10+ min)
    full = "--full" in sys.argv
    print(f"fwd only          : {lat(v_fwd, variables, frame, old_img, feat):7.1f} ms")
    for pre in ((6000, 2048, 1024) if full else (2048,)):
        s1 = make_variant(pre, "prop")
        print(f"+prop  (pre={pre:5d}): {lat(s1, variables, frame, old_img, feat):7.1f} ms")
    if full:
        s2 = make_variant(6000, "psroi")
        print(f"+psroi (pre=6000) : {lat(s2, variables, frame, old_img, feat):7.1f} ms")
        s3 = make_variant(6000, "full")
        print(f"full   (pre=6000) : {lat(s3, variables, frame, old_img, feat):7.1f} ms")
    s4 = make_variant(2048 if not full else 1024, "full")
    print(f"full   (pre={2048 if not full else 1024:5d}): "
          f"{lat(s4, variables, frame, old_img, feat):7.1f} ms")


if __name__ == "__main__":
    main()
