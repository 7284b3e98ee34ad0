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


def _gop_eval_reason(rec, cfg) -> str | None:
    """GOP-scan eligibility; returns None when eligible, else the reason
    the video falls back to the ~6x-slower per-frame path (logged —
    a silent fallback looked like a perf regression in round 2).

    The key schedule must EQUAL the GOP size: process_prepared_window
    keys every GOP, so a multiple like 24 would silently produce more
    key frames than the streaming schedule (and the reference's
    loader.py:92-97)."""
    from lsfa_tpu.data.loader import GOP_SIZE, prepared_available

    video = rec.get("video_path")
    if video is None or not os.path.exists(video):
        return "no compressed stream on disk"
    if not prepared_available():
        return "native prepared-decode plane not built"
    if cfg.TEST.KEY_FRAME_INTERVAL != GOP_SIZE:
        return (f"KEY_FRAME_INTERVAL={cfg.TEST.KEY_FRAME_INTERVAL} != "
                f"GOP_SIZE={GOP_SIZE} (GOP window keys every GOP)")
    if rec["frame_seg_len"] < GOP_SIZE:
        return f"video shorter than one GOP ({rec['frame_seg_len']} frames)"
    return None


def _load_det_cache(det_cache, log):
    """Detection-cache pickle load (tester.py:204-208 role); None on miss."""
    if det_cache and os.path.exists(det_cache):
        with open(det_cache, "rb") as f:
            log(f"loaded detection cache {det_cache}")
            return pickle.load(f)
    return None


def _save_det_cache(det_cache, detections):
    if det_cache:
        os.makedirs(os.path.dirname(det_cache) or ".", exist_ok=True)
        with open(det_cache, "wb") as f:
            pickle.dump(detections, f, protocol=pickle.HIGHEST_PROTOCOL)


def _frame_bases(video_roidb):
    """Global frame index base per video rec (keyed by id(rec), original
    order) + the total frame count."""
    base = {}
    acc = 0
    for rec in video_roidb:
        base[id(rec)] = acc
        acc += rec["frame_seg_len"]
    return base, acc


def eval_videos(model, variables, cfg, video_roidb, det_cache: str | None = None,
                logger=None, max_frames: int | None = None,
                lt_off: bool = False):
    """Run streaming detection over videos (bucketed by orientation).
    Returns {global_frame_idx -> {labels, scores, boxes}} detections,
    indexed in the original video_roidb frame order.

    lt_off=True disables the long-term aggregation stage at inference
    (every key frame bootstraps — see StreamingDetector.lt_off): an
    eval-time module A/B on identical weights."""
    log = logger.info if logger else print
    cached = _load_det_cache(det_cache, log)
    if cached is not None:
        return cached

    from lsfa_tpu.data.prefetch import DevicePrefetcher

    base, acc = _frame_bases(video_roidb)

    timer = PhaseTimer()
    detections = {}
    groups = group_videos_by_bucket(video_roidb, cfg)
    for bucket, recs in groups.items():
        log(f"bucket {bucket}: {len(recs)} videos"
            + (" [long-term aggregation OFF]" if lt_off else ""))
        det = StreamingDetector(model, variables, cfg, bucket, lt_off=lt_off)
        frame_counter = 0
        # ---- GOP-scan fast path: whole GOP windows per dispatch ----
        # ~6x the per-frame mode on dispatch-latency-bound runtimes;
        # equivalence-tested against streaming (test_streaming.py)
        gop_recs, frame_recs = [], []
        fallback_reasons: dict = {}
        for rec in recs:
            reason = _gop_eval_reason(rec, cfg)
            if reason is None:
                gop_recs.append(rec)
            else:
                fallback_reasons[reason] = fallback_reasons.get(reason, 0) + 1
                frame_recs.append(rec)
        for reason, count in fallback_reasons.items():
            log(f"GOP-scan fallback -> per-frame path for {count} "
                f"video(s): {reason}")
        # one-window deferred posting (the bench.py e2e_trial pattern):
        # dispatch window g, THEN convert/collect window g-1 while g's
        # transfer+compute are in flight — the decode of g+1 also overlaps
        # because dispatch is async. Bounds in-flight work to 2 windows.
        # Results are bitwise identical (posting only moves one window
        # later); equivalence vs streaming is pinned by test_streaming.py.
        pending = None   # (outs, win, real, vid_base)

        def flush_pending():
            nonlocal pending, frame_counter
            if pending is None:
                return
            (kd, kv, cd, cv), pwin, preal, pbase = pending
            with timer.phase("post"):
                kd, kv = np.asarray(kd), np.asarray(kv)
                cd, cv = np.asarray(cd), np.asarray(cv)
                for wi in range(preal):
                    g = pwin[wi]
                    detections[pbase + g * GOP_SIZE] = \
                        collect_detections(kd[wi], kv[wi])
                    for i in range(cd.shape[1]):
                        detections[pbase + g * GOP_SIZE + 1 + i] = \
                            collect_detections(cd[wi, i], cv[wi, i])
                    frame_counter += 1 + cd.shape[1]
            pending = None

        from lsfa_tpu.data.loader import GOP_SIZE, PreparedVideo

        for rec in gop_recs:
            det.reset()
            pv = PreparedVideo(rec["video_path"], cfg, bucket,
                               oracle=rec.get("oracle")
                               if getattr(cfg.network, "oracle_mv", False)
                               else None)
            n_gops = min(rec["frame_seg_len"], pv.num_frames) // GOP_SIZE
            G = int(getattr(cfg.tpu, "eval_gop_window", 2))
            vid_base = base[id(rec)]
            g0 = 0
            while g0 < n_gops:
                win = list(range(g0, min(g0 + G, n_gops)))
                real = len(win)
                while len(win) < G:        # pad tail, drop its outputs
                    win.append(win[-1])
                with timer.phase("data"):
                    payloads = [pv.gop(g) for g in win]
                with timer.phase("net"):
                    outs = det.process_prepared_window(
                        payloads, first=(g0 == 0))
                flush_pending()
                pending = (outs, win, real, vid_base)
                timer.tick()
                g0 += real
            # trailing partial GOP (if any) falls through to per-frame
            rest = rec["frame_seg_len"] - n_gops * GOP_SIZE
            if rest > 0:
                tail = dict(rec)
                tail["_tail_start"] = n_gops * GOP_SIZE
                # the per-frame loop indexes `base` by id() of ITS records
                base[id(tail)] = vid_base
                frame_recs.append(tail)
            if max_frames is not None and frame_counter >= max_frames:
                break
        flush_pending()

        if frame_recs and (max_frames is None
                           or frame_counter < max_frames):
            loader = DevicePrefetcher(
                EvalLoader(frame_recs, cfg, bucket_hw=bucket), depth=2)
            cur_video = -1
            for item in loader:
                rec = frame_recs[item["video_index"]]
                # EvalLoader starts iteration at _tail_start, so frames
                # the GOP path covered never reach this loop
                tail_start = rec.get("_tail_start", 0)
                if item["video_index"] != cur_video:
                    det.reset()
                    cur_video = item["video_index"]
                # a tail after the GOP path starts at a key frame but the
                # detector state was reset — bootstrap it (flag 0) like a
                # fresh stream
                flag = item["flag"]
                if tail_start and item["frame_id"] == tail_start:
                    flag = 0
                with timer.phase("net"):
                    d, v = det.process_frame(
                        item["data"], item["im_info"],
                        item["motion_vector"], item["res_diff"],
                        flag=flag, small=item["small"])
                with timer.phase("post"):
                    gidx = base[id(rec)] + item["frame_id"]
                    detections[gidx] = collect_detections(d, v)
                timer.tick()
                frame_counter += 1
                if max_frames is not None and frame_counter >= max_frames:
                    break
    log(timer.summary())
    _save_det_cache(det_cache, detections)
    return detections


def eval_videos_timeplex(model, variables, cfg, video_roidb,
                         streams: int = 3, det_cache: str | None = None,
                         logger=None, max_frames: int | None = None,
                         lt_off: bool = False):
    """N-stream aggregate throughput by TIME-MULTIPLEXING, not lockstep
    lane batching: each stream keeps its own device-resident recurrent
    state (~6 MB of feat_key/data_key handles), and windows from
    different streams round-robin through the ONE single-lane GOP-scan
    program — the program bench.py measures at peak device FPS. Decode
    runs in one producer thread per stream, overlapped with dispatch.

    Rationale (round-4 finding): lane-batched lockstep compute costs
    3.6x the single-lane window for 3x the frames, so 3 lockstep lanes
    produce FEWER total frames than one stream. Swapping stream carries
    between dispatches reuses the peak-FPS program for every frame; on a
    multi-core serving host the per-stream decode threads scale the
    aggregate linearly until the device saturates. The reference's
    throughput answer is the same shape — stream-level sharding, one
    worker per compute unit (function/test_rcnn.py:69-75,
    core/tester.py:301-312) — not batched lockstep.

    Detections are identical to eval_videos over the same records (same
    program, same per-video recurrence; only the dispatch ORDER
    interleaves streams) — pinned by tests/test_timeplex.py."""
    import queue as _q
    import threading

    log = logger.info if logger else print
    cached = _load_det_cache(det_cache, log)
    if cached is not None:
        return cached

    from lsfa_tpu.data.loader import GOP_SIZE, PreparedVideo
    from lsfa_tpu.data.prefetch import DevicePrefetcher

    base, _ = _frame_bases(video_roidb)
    timer = PhaseTimer()
    detections = {}
    oracle_on = bool(getattr(cfg.network, "oracle_mv", False))
    G = int(getattr(cfg.tpu, "eval_gop_window", 2))
    groups = group_videos_by_bucket(video_roidb, cfg)
    for bucket, recs in groups.items():
        det = StreamingDetector(model, variables, cfg, bucket,
                                lt_off=lt_off)
        gop_recs, frame_recs = [], []
        for rec in recs:
            reason = _gop_eval_reason(rec, cfg)
            (gop_recs if reason is None else frame_recs).append(rec)
        S = max(1, min(streams, len(gop_recs)))
        log(f"bucket {bucket}: {len(recs)} videos over {S} "
            f"time-multiplexed streams")
        # greedy length-balanced stream assignment (test_rcnn.py:69-75)
        lanes: list = [[] for _ in range(S)]
        loads = np.zeros(S)
        for rec in sorted(gop_recs, key=lambda r: -r["frame_seg_len"]):
            i = int(np.argmin(loads))
            lanes[i].append(rec)
            loads[i] += rec["frame_seg_len"]

        stop = threading.Event()
        tails: list = [[] for _ in range(S)]
        qs = [_q.Queue(maxsize=2) for _ in range(S)]

        def producer(s):
            try:
                for rec in lanes[s]:
                    pv = PreparedVideo(
                        rec["video_path"], cfg, bucket,
                        oracle=rec.get("oracle") if oracle_on else None)
                    n_gops = min(rec["frame_seg_len"],
                                 pv.num_frames) // GOP_SIZE
                    vid_base = base[id(rec)]
                    g0, first = 0, True
                    while g0 < n_gops and not stop.is_set():
                        win = list(range(g0, min(g0 + G, n_gops)))
                        real = len(win)
                        while len(win) < G:
                            win.append(win[-1])
                        payloads = [pv.gop(g) for g in win]
                        while not stop.is_set():
                            try:
                                qs[s].put((payloads, win, real, vid_base,
                                           first), timeout=0.5)
                                break
                            except _q.Full:
                                continue
                        first = False
                        g0 += real
                    rest = rec["frame_seg_len"] - n_gops * GOP_SIZE
                    if rest > 0:
                        tails[s].append((rec, n_gops * GOP_SIZE, vid_base))
            except BaseException as e:          # surface in the consumer
                qs[s].put(e)
                return
            qs[s].put(None)

        threads = [threading.Thread(target=producer, args=(s,),
                                    daemon=True) for s in range(S)]
        for t in threads:
            t.start()

        from collections import deque
        live = deque(range(S))
        states: dict = {}
        pending = None          # one window in flight beyond the current
        frame_counter = 0

        def flush_pending():
            nonlocal pending, frame_counter
            if pending is None:
                return
            (kd, kv, cd, cv), pwin, preal, pbase = pending
            with timer.phase("post"):
                kd, kv = np.asarray(kd), np.asarray(kv)
                cd, cv = np.asarray(cd), np.asarray(cv)
                for wi in range(preal):
                    g = pwin[wi]
                    detections[pbase + g * GOP_SIZE] = \
                        collect_detections(kd[wi], kv[wi])
                    for i in range(cd.shape[1]):
                        detections[pbase + g * GOP_SIZE + 1 + i] = \
                            collect_detections(cd[wi, i], cv[wi, i])
                    frame_counter += 1 + cd.shape[1]
            pending = None

        while live:
            s = live.popleft()
            with timer.phase("data"):
                item = qs[s].get()
            if item is None:
                continue                       # stream exhausted
            if isinstance(item, BaseException):
                stop.set()
                raise item
            live.append(s)
            payloads, win, real, vid_base, first = item
            with timer.phase("net"):
                if first:
                    det.reset()                # new video bootstraps
                else:
                    det.set_state(states[s])
                outs = det.process_prepared_window(payloads, first=first)
                states[s] = det.get_state()
            flush_pending()
            pending = (outs, win, real, vid_base)
            timer.tick()
            if max_frames is not None and frame_counter >= max_frames:
                stop.set()
                break
        flush_pending()
        stop.set()

        # per-frame fallback: ineligible videos + partial-GOP tails
        for s in range(S):
            for rec, tail_start, vid_base in tails[s]:
                t_rec = dict(rec)
                t_rec["_tail_start"] = tail_start
                base[id(t_rec)] = vid_base
                frame_recs.append(t_rec)
        if frame_recs and (max_frames is None
                           or frame_counter < max_frames):
            loader = DevicePrefetcher(
                EvalLoader(frame_recs, cfg, bucket_hw=bucket), depth=2)
            cur_video = -1
            for item in loader:
                rec = frame_recs[item["video_index"]]
                tail_start = rec.get("_tail_start", 0)
                if item["video_index"] != cur_video:
                    det.reset()
                    cur_video = item["video_index"]
                flag = item["flag"]
                if tail_start and item["frame_id"] == tail_start:
                    flag = 0
                with timer.phase("net"):
                    d, v = det.process_frame(
                        item["data"], item["im_info"],
                        item["motion_vector"], item["res_diff"],
                        flag=flag, small=item["small"])
                with timer.phase("post"):
                    detections[base[id(rec)] + item["frame_id"]] = \
                        collect_detections(d, v)
                timer.tick()
                frame_counter += 1
                if max_frames is not None and frame_counter >= max_frames:
                    break
    log(timer.summary())
    _save_det_cache(det_cache, detections)
    return detections


def eval_videos_rfcn(model, variables, cfg, video_roidb,
                     det_cache: str | None = None, logger=None,
                     max_frames: int | None = None):
    """Single-frame R-FCN baseline mAP path (the reference rfcn/ package's
    test_rcnn + pred_eval, rfcn/core/tester.py): every frame runs the
    full backbone — no key-frame state, no MV/residual. Returns the same
    {global_frame_idx -> dets} mapping as eval_videos."""
    from lsfa_tpu.data.prefetch import DevicePrefetcher
    from lsfa_tpu.eval.rfcn_tester import RFCNDetector
    from lsfa_tpu.eval.tester import collect_detections

    log = logger.info if logger else print
    cached = _load_det_cache(det_cache, log)
    if cached is not None:
        return cached

    base, acc = _frame_bases(video_roidb)

    timer = PhaseTimer()
    detections = {}
    frame_counter = 0
    for bucket, recs in group_videos_by_bucket(video_roidb, cfg).items():
        log(f"bucket {bucket}: {len(recs)} videos (rfcn per-frame)")
        det = RFCNDetector(model, variables, cfg, bucket)
        loader = DevicePrefetcher(
            EvalLoader(recs, cfg, bucket_hw=bucket, full_frames=True),
            depth=2)
        for item in loader:
            with timer.phase("net"):
                d, v = det.detect(item["data"], item["im_info"])
            with timer.phase("post"):
                rec = recs[item["video_index"]]
                gidx = base[id(rec)] + item["frame_id"]
                detections[gidx] = collect_detections(d, v)
            timer.tick()
            frame_counter += 1
            if max_frames is not None and frame_counter >= max_frames:
                break
    log(timer.summary())
    _save_det_cache(det_cache, detections)
    return detections


def eval_videos_lanes(model, variables, cfg, video_roidb, lanes: int,
                      det_cache: str | None = None, logger=None,
                      mesh=None, max_frames: int | None = None):
    """Multi-lane (and optionally mesh-sharded) mAP-path evaluation:
    `lanes` video streams run in lockstep as one batched program per
    bucket group, detections merged back to the GLOBAL frame order of
    video_roidb — the production form of the reference's multi-GPU video
    sharding (function/test_rcnn.py:69-75, tester.py:301-312
    pred_eval_multiprocess). Returns the same {global_frame_idx -> dets}
    mapping as eval_videos, so evaluate_map consumes either."""
    from lsfa_tpu.eval.multistream import eval_videos_multistream

    log = logger.info if logger else print
    cached = _load_det_cache(det_cache, log)
    if cached is not None:
        return cached

    base, acc = _frame_bases(video_roidb)

    detections = {}
    budget = max_frames
    for bucket, recs in group_videos_by_bucket(video_roidb, cfg).items():
        if budget is not None and budget <= 0:
            log(f"bucket {bucket}: skipped (max_frames reached)")
            continue
        log(f"bucket {bucket}: {len(recs)} videos over {lanes} lanes")
        # lanes run lockstep, so the frame cap translates to a step cap
        # (each step advances every lane one frame)
        max_steps = (None if budget is None
                     else max(1, -(-budget // lanes)))
        stats: dict = {}
        lane_dets = eval_videos_multistream(
            model, variables, cfg, recs, lanes=lanes, logger=logger,
            mesh=mesh, bucket_hw=bucket, max_steps=max_steps, stats=stats)
        if budget is not None:
            # charge by device work (steps x lanes incl. idle-lane
            # padding), not unique frames — otherwise short buckets with
            # idle lanes let later buckets blow past max_frames
            budget -= stats.get("steps", 0) * lanes
        for (vi, fid), det in lane_dets.items():
            gidx = base[id(recs[vi])] + fid
            if fid < recs[vi]["frame_seg_len"]:
                detections[gidx] = det
    missing = acc - len(detections)
    if missing and max_frames is None:
        log(f"WARNING: {missing} frames produced no detections record")
    _save_det_cache(det_cache, detections)
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
