#!/usr/bin/env python
"""Evaluation launcher (the experiments/dff_rfcn/dff_rfcn_test.py role).

Usage: python experiments/lsfa_test.py --cfg configs/lsfa_resnet101_vid.yaml \
           [--ckpt <dir>] [--ignore-cache] [--max-frames N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lsfa_tpu.utils.env import setup_cache

setup_cache()  # honor JAX_PLATFORMS + persistent compile cache (utils/env.py)


def resolve_train_ckpt_dir(cfg, out_dir: str) -> str | None:
    """Default checkpoint tree for this config: the TRAIN run's directory
    (create_logger uses the image_set verbatim) + TRAIN.model_prefix —
    the reference's test.py:57 convention. None if absent."""
    cand = os.path.join(os.path.dirname(out_dir), cfg.dataset.image_set,
                        "checkpoints", cfg.TRAIN.model_prefix)
    return cand if os.path.isdir(cand) else None


def run_test(cfg, params=None, batch_stats=None, ckpt_dir=None,
             ignore_cache=False, max_frames=None, lanes: int = 1,
             mesh_shape: int = 0, vis_frames: int = 0,
             thresh: float | None = None, streams: int = 0):
    """streams > 1 time-multiplexes that many video streams through the
    single-lane scan program (per-stream device-resident carries — the
    aggregate-throughput default; eval_videos_timeplex). lanes > 1
    instead batches streams in LOCKSTEP per dispatch (opt-in for
    dispatch-bound hosts); mesh_shape > 0 additionally shards the
    lane axis over that many devices (lanes % mesh_shape == 0).
    vis_frames/thresh mirror the reference launcher's --vis/--thresh
    (dff_rfcn/test.py:24-39): annotate the first N frames / override the
    detection score threshold."""
    import jax

    from lsfa_tpu.data.dataset import ImageNetVID
    from lsfa_tpu.eval.driver import (eval_videos, eval_videos_lanes,
                                      eval_videos_rfcn,
                                      eval_videos_timeplex, evaluate_map)
    from lsfa_tpu.train.driver import is_rfcn
    from lsfa_tpu.train.checkpoint import load_checkpoint
    from lsfa_tpu.train.driver import init_model
    from lsfa_tpu.utils import create_logger

    logger, out_dir = create_logger(cfg.output_path, cfg.symbol,
                                    cfg.dataset.test_image_set)
    if thresh is not None:
        cfg.TEST.SCORE_THRESH = float(thresh)
    model, init_params, init_bs = init_model(cfg)
    if params is None:
        if not ckpt_dir:
            ckpt_dir = resolve_train_ckpt_dir(cfg, out_dir)
        if ckpt_dir:
            # TEST.test_epoch selects the checkpoint (0 = latest)
            epoch = int(cfg.TEST.test_epoch) or None
            restored, step = load_checkpoint(ckpt_dir, epoch=epoch)
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
    if is_rfcn(cfg):
        # single-frame baseline: per-frame full-backbone detection
        # (rfcn/function/test_rcnn.py role)
        dets = eval_videos_rfcn(model, variables, cfg, video_roidb,
                                det_cache=cache, logger=logger,
                                max_frames=max_frames)
    elif streams > 1:
        dets = eval_videos_timeplex(model, variables, cfg, video_roidb,
                                    streams=streams, det_cache=cache,
                                    logger=logger, max_frames=max_frames)
    elif lanes > 1:
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
                                 logger=logger, mesh=mesh,
                                 max_frames=max_frames)
    else:
        dets = eval_videos(model, variables, cfg, video_roidb,
                           det_cache=cache, logger=logger,
                           max_frames=max_frames)
    if vis_frames:
        import numpy as np
        from PIL import Image

        from lsfa_tpu.utils.vis import draw_detections

        vis_dir = os.path.join(out_dir, "vis")
        os.makedirs(vis_dir, exist_ok=True)
        gidx = 0
        written = 0
        for rec in video_roidb:
            for fid in range(rec["frame_seg_len"]):
                if written >= vis_frames:
                    break
                path = rec["pattern"] % fid
                if gidx in dets and os.path.exists(path):
                    im = np.asarray(Image.open(path).convert("RGB"))
                    draw_detections(im, dets[gidx]).save(
                        os.path.join(vis_dir, f"{gidx:06d}.jpg"))
                    written += 1
                gidx += 1
            if written >= vis_frames:
                break
        logger.info(f"wrote {written} annotated frames to {vis_dir}")
    return evaluate_map(dets, ds, video_roidb, logger=logger)


def main():
    ap = argparse.ArgumentParser(description="LSFA-TPU evaluation")
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--ckpt", default=None, help="checkpoint directory")
    ap.add_argument("--ignore-cache", action="store_true")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--streams", type=int, default=0,
                    help="time-multiplexed video streams through the "
                         "single-lane program (aggregate-throughput "
                         "default)")
    ap.add_argument("--lanes", type=int, default=1,
                    help="video streams batched per dispatch in lockstep "
                         "(opt-in inference DP for dispatch-bound hosts)")
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard the lane axis over this many devices")
    ap.add_argument("--vis", type=int, default=0, metavar="N",
                    help="write the first N annotated frames")
    ap.add_argument("--thresh", type=float, default=None,
                    help="detection score threshold override")
    ap.add_argument("--decode-workers", type=int, default=None,
                    help="lane-parallel decode threads (multi-lane runs; "
                         "default cfg.tpu.decode_workers)")
    args = ap.parse_args()

    from lsfa_tpu.config import load_config

    cfg = load_config(args.cfg)
    if args.decode_workers is not None:
        cfg.tpu.decode_workers = args.decode_workers
    run_test(cfg, ckpt_dir=args.ckpt, ignore_cache=args.ignore_cache,
             max_frames=args.max_frames, lanes=args.lanes,
             mesh_shape=args.mesh, vis_frames=args.vis, thresh=args.thresh,
             streams=args.streams)


if __name__ == "__main__":
    main()
