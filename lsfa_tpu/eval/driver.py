"""Evaluation driver: detect over VID val videos and compute mAP.

Behavioral target: test_rcnn (dff_rfcn/function/test_rcnn.py:50-89) +
pred_eval/pred_eval_multiprocess (core/tester.py:192-312):
  * videos greedily sharded by total frame count across workers,
  * per-video streaming inference with the key/non-key state machine,
  * per-class NMS + cap (inside the jitted detector here),
  * detection cache to skip re-running the net when re-scoring,
  * mAP via the VID evaluator.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from lsfa_tpu.data.dataset import ImageNetVID
from lsfa_tpu.data.loader import EvalLoader
from lsfa_tpu.eval.tester import StreamingDetector, collect_detections
from lsfa_tpu.eval.vid_eval import vid_eval
from lsfa_tpu.utils import PhaseTimer


def shard_videos(roidb, n_shards: int):
    """Greedy bin-packing by frame count (function/test_rcnn.py:69-75)."""
    order = np.argsort([-r["frame_seg_len"] for r in roidb])
    shards = [[] for _ in range(n_shards)]
    loads = np.zeros(n_shards)
    for i in order:
        s = int(np.argmin(loads))
        shards[s].append(roidb[i])
        loads[s] += roidb[i]["frame_seg_len"]
    return shards


def group_videos_by_bucket(video_roidb, cfg):
    """Partition videos by the image bucket their resized frames fit —
    portrait and landscape streams get separate compiled programs instead
    of one worst-case bucket (fixed shapes, zero recompiles per group)."""
    from lsfa_tpu.data import coviar
    from lsfa_tpu.data.image import pick_bucket

    target, max_size = cfg.SCALES[0]
    buckets = [tuple(cfg.tpu.default_bucket)] + [
        tuple(b) for b in cfg.tpu.image_buckets]
    groups: dict = {}
    for rec in video_roidb:
        h, w = rec.get("height", 0), rec.get("width", 0)
        if not h or not w:
            vp = rec.get("video_path")
            if vp and coviar.available() and os.path.exists(vp):
                r = coviar.VideoReader(vp)
                h, w = r.height, r.width
            else:
                from PIL import Image

                with Image.open(rec["pattern"] % 0) as im:
                    w, h = im.size
        b = pick_bucket(h, w, buckets, target, max_size)
        groups.setdefault(b, []).append(rec)
    return groups


def eval_videos(model, variables, cfg, video_roidb, det_cache: str | None = None,
                logger=None, max_frames: int | None = None):
    """Run streaming detection over videos (bucketed by orientation).
    Returns {global_frame_idx -> {labels, scores, boxes}} detections,
    indexed in the original video_roidb frame order."""
    log = logger.info if logger else print
    if det_cache and os.path.exists(det_cache):
        with open(det_cache, "rb") as f:
            log(f"loaded detection cache {det_cache}")
            return pickle.load(f)

    from lsfa_tpu.data.prefetch import DevicePrefetcher

    # global frame index base per video (original order)
    base = {}
    acc = 0
    for i, rec in enumerate(video_roidb):
        base[id(rec)] = acc
        acc += rec["frame_seg_len"]

    timer = PhaseTimer()
    detections = {}
    groups = group_videos_by_bucket(video_roidb, cfg)
    for bucket, recs in groups.items():
        log(f"bucket {bucket}: {len(recs)} videos")
        det = StreamingDetector(model, variables, cfg, bucket)
        loader = DevicePrefetcher(
            EvalLoader(recs, cfg, bucket_hw=bucket), depth=2)
        cur_video = -1
        frame_counter = 0
        for item in loader:
            if item["video_index"] != cur_video:
                det.reset()
                cur_video = item["video_index"]
            with timer.phase("net"):
                d, v = det.process_frame(
                    item["data"], item["im_info"], item["motion_vector"],
                    item["res_diff"], flag=item["flag"], small=item["small"])
            with timer.phase("post"):
                gidx = base[id(recs[cur_video])] + item["frame_id"]
                detections[gidx] = collect_detections(d, v)
            timer.tick()
            frame_counter += 1
            if max_frames is not None and frame_counter >= max_frames:
                break
    log(timer.summary())
    if det_cache:
        os.makedirs(os.path.dirname(det_cache) or ".", exist_ok=True)
        with open(det_cache, "wb") as f:
            pickle.dump(detections, f, protocol=pickle.HIGHEST_PROTOCOL)
    return detections


def evaluate_map(detections, dataset: ImageNetVID, video_roidb, logger=None):
    """Per-frame annotations from the video roidb -> mAP@0.5."""
    log = logger.info if logger else print
    annotations = {}
    idx = 0
    for rec in video_roidb:
        for fid in range(rec["frame_seg_len"]):
            entry = {"path": rec["vid_path"], "frame_seg_id": fid}
            anno = dataset._load_annotation(entry)
            annotations[idx] = {"labels": anno["gt_classes"],
                                "boxes": anno["boxes"]}
            idx += 1
    ap = vid_eval(detections, annotations, dataset.num_classes)
    mean_ap = float(np.nanmean(ap))
    for name, a in zip(dataset.classes[1:], ap):
        log(f"AP {name:>16s} = {a:.4f}" if np.isfinite(a)
            else f"AP {name:>16s} = (no gt)")
    log(f"mAP@0.5 = {mean_ap:.4f}")
    return mean_ap, ap
