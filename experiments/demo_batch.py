#!/usr/bin/env python
"""Batched-GOP demo: 1 key + N-1 frames in ONE forward (DFF-style warp).

Reference role: dff_rfcn/demo_batch.py (get_batch_test_symbol +
MultiProposal) — here the batched graph + batched proposals all run in a
single jitted call, which amortizes dispatch and keeps the MXU busy.

Usage:
  python experiments/demo_batch.py --cfg configs/lsfa_resnet101_vid.yaml \
      --video clip.mp4 [--synthesize]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lsfa_tpu.utils.env import setup_cache

setup_cache()  # honor JAX_PLATFORMS + persistent compile cache (utils/env.py)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--video", required=True)
    ap.add_argument("--gop", type=int, default=0)
    ap.add_argument("--synthesize", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lsfa_tpu.config import load_config
    from lsfa_tpu.data import coviar
    from lsfa_tpu.data.image import pad_to_bucket, resize, transform
    from lsfa_tpu.eval.detector import detect_from_maps
    from lsfa_tpu.ops.anchors import anchor_grid
    from lsfa_tpu.train.driver import init_model

    cfg = load_config(args.cfg)
    if args.synthesize:
        coviar.encode_test_video(args.video, n_frames=24, w=320, h=240,
                                 gop_size=12, seed=0)
    model, params, batch_stats = init_model(cfg)
    variables = {"params": params, "batch_stats": batch_stats}

    bucket = tuple(cfg.tpu.default_bucket)
    reader = coviar.VideoReader(args.video)
    bgr, _, _ = reader.decode_gop(args.gop)
    target, max_size = cfg.SCALES[0]
    frames, im_info = [], None
    for f in bgr:
        im_r, im_scale = resize(f.astype(np.float32), target, max_size)
        frames.append(pad_to_bucket(
            transform(im_r, cfg.network.PIXEL_MEANS, cfg.network.PIXEL_SCALE),
            bucket))
        im_info = np.asarray([im_r.shape[0], im_r.shape[1], im_scale],
                             np.float32)
    batch = np.concatenate(frames)

    fh, fw = bucket[0] // 16, bucket[1] // 16
    anchors = jnp.asarray(anchor_grid(fh, fw, 16,
                                      tuple(cfg.network.ANCHOR_RATIOS),
                                      tuple(cfg.network.ANCHOR_SCALES)))

    @jax.jit
    def gop_step(variables, data_key, data_other, im_info):
        out = model.apply(variables, data_key, data_other,
                          method=model.forward_batch_gop)
        def det_one(i):
            sub = jax.tree.map(lambda x: x[i:i + 1], out)
            return detect_from_maps(sub, anchors, im_info,
                                    num_classes=cfg.dataset.NUM_CLASSES)
        n = data_other.shape[0] + 1
        return [det_one(i) for i in range(n)]

    dets = gop_step(variables, jnp.asarray(batch[:1]), jnp.asarray(batch[1:]),
                    jnp.asarray(im_info))
    for i, (d, v) in enumerate(dets):
        print(f"frame {i}: {int(np.asarray(v).sum())} detections")


if __name__ == "__main__":
    main()
