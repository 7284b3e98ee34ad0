#!/usr/bin/env python
"""Re-evaluate a trained ablation-rung checkpoint on an extended,
FRESH held-out synthetic val set.

The ladder's in-run eval (tools/train_synth_full.py) scores 6 val videos
/ 216 frames — small enough that rung-to-rung mAP deltas of ~0.01 ride
on sampling noise. This tool loads the rung's orbax checkpoint,
reconstructs the exact rung graph (shared rung_cfg), generates a larger
val set under a DIFFERENT generator seed (so it is new data, not a
superset of the in-run split), and runs the production streaming eval
driver + vid_eval.

Reference analog: re-scoring a trained model on the full VID val set
(dff_rfcn/test.py + function/test_rcnn.py:50-89) rather than a subsample.

Usage:
  python tools/eval_rung.py --rung small --ckpt /tmp/lsfa_ablation/small/checkpoints \
      [--val-videos 24] [--val-seed 2000] [--frames 36] [--profile hard] \
      [--out runs/ablation_r04]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from train_synth_full import rung_cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rung", required=True,
                    choices=["full", "small", "rnet", "mv_only", "rfcn",
                             "oracle"])
    ap.add_argument("--ckpt", default="",
                    help="orbax checkpoint dir (default "
                         "/tmp/lsfa_ablation/<rung>/checkpoints)")
    ap.add_argument("--epoch", type=int, default=None,
                    help="checkpoint epoch (default: latest)")
    ap.add_argument("--data", default="/tmp/lsfa_synth_data")
    ap.add_argument("--val-videos", type=int, default=24)
    ap.add_argument("--val-seed", type=int, default=2000)
    ap.add_argument("--frames", type=int, default=36)
    ap.add_argument("--profile", default="hard", choices=["easy", "hard"])
    ap.add_argument("--out", default="runs/ablation_r04",
                    help="directory for report_<rung>_xval.json")
    ap.add_argument("--tag", default=None,
                    help="report filename tag (default xval, or "
                         "xval_ltoff with --lt-off)")
    ap.add_argument("--lt-off", action="store_true",
                    help="disable the long-term aggregation stage at "
                         "inference (every key frame bootstraps): same "
                         "weights, exact eval-time A/B of what the "
                         "FlowNet/Nq long-term stage buys")
    ap.add_argument("--max-eval-frames", type=int, default=None)
    ap.add_argument("--cpu-smoke", action="store_true",
                    help="tiny net on CPU (CI smoke of this tool)")
    args = ap.parse_args()
    if args.tag is None:
        args.tag = "xval_ltoff" if args.lt_off else "xval"
    if args.lt_off and args.rung == "rfcn":
        ap.error("--lt-off is meaningless for the single-frame rfcn rung")

    import jax

    if args.cpu_smoke:
        jax.config.update("jax_platforms", "cpu")

    from lsfa_tpu.data.synth import make_synth_vid_dataset
    from lsfa_tpu.eval.vid_eval import vid_eval
    from lsfa_tpu.train.checkpoint import load_checkpoint
    from lsfa_tpu.train.driver import init_model
    from lsfa_tpu.utils import create_logger

    ckpt = args.ckpt or f"/tmp/lsfa_ablation/{args.rung}/checkpoints"
    cfg, sizes = rung_cfg(args.rung, cpu_smoke=args.cpu_smoke)
    cfg.output_path = args.out
    logger, _ = create_logger(cfg.output_path, cfg.symbol,
                              f"xval_{args.rung}")

    _, val_roidb, val_annos = make_synth_vid_dataset(
        args.data, n_videos=args.val_videos, n_frames=args.frames,
        seed=args.val_seed, sizes=sizes, split="val",
        profile=args.profile, oracle=(args.rung == "oracle"))
    logger.info(f"extended val set: {len(val_roidb)} videos x "
                f"{args.frames} frames (seed {args.val_seed})")

    model, variables, init_bs = init_model(cfg, logger=logger)
    restored, epoch = load_checkpoint(ckpt, args.epoch)
    variables = {"params": restored["params"],
                 "batch_stats": restored.get("batch_stats") or init_bs}
    logger.info(f"loaded rung '{args.rung}' checkpoint epoch {epoch} "
                f"from {ckpt}")

    t_eval = time.perf_counter()
    if args.rung == "rfcn":
        from lsfa_tpu.eval.driver import eval_videos_rfcn
        dets = eval_videos_rfcn(model, variables, cfg, val_roidb,
                                logger=logger,
                                max_frames=args.max_eval_frames)
    else:
        from lsfa_tpu.eval.driver import eval_videos
        dets = eval_videos(model, variables, cfg, val_roidb, logger=logger,
                           max_frames=args.max_eval_frames,
                           lt_off=args.lt_off)
    eval_wall = time.perf_counter() - t_eval

    n_cls = cfg.dataset.NUM_CLASSES
    gt_classes = sorted({int(l) for a in val_annos.values()
                         for l in a["labels"]})

    def subset_map(frame_filter):
        sub_d = {g: d for g, d in dets.items() if frame_filter(g)}
        sub_a = {g: a for g, a in val_annos.items() if frame_filter(g)}
        ap = vid_eval(sub_d, sub_a, n_cls)
        vals = np.asarray([ap[c - 1] if np.isfinite(ap[c - 1]) else 0.0
                           for c in gt_classes])
        return (float(vals.mean()) if len(vals) else float("nan")), vals

    mean_ap, ap_gt = subset_map(lambda g: True)
    # key/non-key split: every video is args.frames long, key frames sit
    # at frame_id % KEY_FRAME_INTERVAL == 0 — the aggregation modules act
    # on different frame populations (long-term: key; R-net/small-net:
    # non-key), so the split localizes where a module buys or loses mAP
    ki = cfg.TEST.KEY_FRAME_INTERVAL
    map_key, _ = subset_map(lambda g: (g % args.frames) % ki == 0)
    map_nonkey, _ = subset_map(lambda g: (g % args.frames) % ki != 0)
    # offset-resolved decay curve: mAP as a function of frames-from-key
    # (0..ki-1). If warped-feature mAP COLLAPSES with offset, propagation
    # leaks; if it is flat-but-low, the warped training (not the warp
    # itself) is the bound. Each bin has eval_frames/ki frames, so single
    # bins are noisy — read the trend, not a bin. (VERDICT r4 item 1a.)
    map_by_offset = [
        round(subset_map(
            lambda g, o=off: (g % args.frames) % ki == o)[0], 4)
        for off in range(ki)]
    n_det = sum(len(d["labels"]) for d in dets.values())
    for c, a in zip(gt_classes, ap_gt):
        logger.info(f"AP class {c} = {a:.4f}")
    logger.info(f"extended-val mAP@0.5 = {mean_ap:.4f} over "
                f"{len(gt_classes)} gt classes ({n_det} detections); "
                f"key-frame mAP = {map_key:.4f}, non-key mAP = "
                f"{map_nonkey:.4f}")
    logger.info("mAP by frames-from-key: "
                + " ".join(f"{m:.3f}" for m in map_by_offset))

    report = {
        "rung": args.rung,
        "profile": args.profile,
        "ckpt": ckpt,
        "ckpt_epoch": int(epoch),
        "val_videos": args.val_videos,
        "val_seed": args.val_seed,
        "lt_off": bool(args.lt_off),
        "eval_wall_s": round(eval_wall, 1),
        "eval_frames": len(dets),
        "n_detections": n_det,
        "mAP_synth_val": round(mean_ap, 4),
        "mAP_key_frames": round(map_key, 4),
        "mAP_nonkey_frames": round(map_nonkey, 4),
        "mAP_by_offset": map_by_offset,
        "ap_per_class": {int(c): round(float(a), 4)
                         for c, a in zip(gt_classes, ap_gt)},
        "platform": str(jax.devices()[0].platform),
    }
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, f"report_{args.rung}_{args.tag}.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
