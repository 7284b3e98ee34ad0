#!/usr/bin/env python
"""Evaluation launcher (the experiments/dff_rfcn/dff_rfcn_test.py role).

Usage: python experiments/lsfa_test.py --cfg configs/lsfa_resnet101_vid.yaml \
           [--ckpt <dir>] [--ignore-cache] [--max-frames N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_test(cfg, params=None, batch_stats=None, ckpt_dir=None,
             ignore_cache=False, max_frames=None, lanes: int = 1,
             mesh_shape: int = 0):
    """lanes > 1 batches that many video streams per dispatch (the
    reference's multi-GPU eval sharding, function/test_rcnn.py:69-75,
    as one lane-batched program); mesh_shape > 0 additionally shards the
    lane axis over that many devices (lanes % mesh_shape == 0)."""
    import jax

    from lsfa_tpu.data.dataset import ImageNetVID
    from lsfa_tpu.eval.driver import (eval_videos, eval_videos_lanes,
                                      evaluate_map)
    from lsfa_tpu.train.checkpoint import load_checkpoint
    from lsfa_tpu.train.driver import init_model
    from lsfa_tpu.utils import create_logger

    logger, out_dir = create_logger(cfg.output_path, cfg.symbol,
                                    cfg.dataset.test_image_set)
    model, init_params, init_bs = init_model(cfg)
    if params is None:
        if ckpt_dir:
            restored, step = load_checkpoint(ckpt_dir)
            params = restored["params"]
            batch_stats = restored.get("batch_stats", init_bs)
            logger.info(f"loaded checkpoint epoch {step}")
        else:
            logger.info("NO checkpoint given: evaluating random init")
            params, batch_stats = init_params, init_bs
    variables = {"params": params, "batch_stats": batch_stats or init_bs}

    ds = ImageNetVID(cfg.dataset.test_image_set, cfg.dataset.root_path,
                     cfg.dataset.dataset_path)
    # one roidb record per video
    video_roidb = []
    for e in ds._index:
        video_roidb.append({
            "vid_path": e["path"],
            "frame_seg_len": e.get("frame_seg_len", 1),
            "pattern": os.path.join(cfg.dataset.dataset_path, "Data", "VID",
                                    e["path"], "%06d.JPEG"),
            "video_path": ds.video_path(e),
        })
    cache = None if ignore_cache else os.path.join(out_dir, "detections.pkl")
    if lanes > 1:
        mesh = None
        if mesh_shape:
            from jax.sharding import Mesh

            devs = jax.devices()[:mesh_shape]
            if lanes % len(devs):
                raise ValueError(
                    f"lanes={lanes} must divide by mesh size {len(devs)}")
            mesh = Mesh(devs, ("data",))
        dets = eval_videos_lanes(model, variables, cfg, video_roidb,
                                 lanes=lanes, det_cache=cache,
                                 logger=logger, mesh=mesh)
    else:
        dets = eval_videos(model, variables, cfg, video_roidb,
                           det_cache=cache, logger=logger,
                           max_frames=max_frames)
    return evaluate_map(dets, ds, video_roidb, logger=logger)


def main():
    ap = argparse.ArgumentParser(description="LSFA-TPU evaluation")
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--ckpt", default=None, help="checkpoint directory")
    ap.add_argument("--ignore-cache", action="store_true")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--lanes", type=int, default=1,
                    help="video streams batched per dispatch (inference DP)")
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard the lane axis over this many devices")
    args = ap.parse_args()

    from lsfa_tpu.config import load_config

    cfg = load_config(args.cfg)
    run_test(cfg, ckpt_dir=args.ckpt, ignore_cache=args.ignore_cache,
             max_frames=args.max_frames, lanes=args.lanes,
             mesh_shape=args.mesh)


if __name__ == "__main__":
    main()
