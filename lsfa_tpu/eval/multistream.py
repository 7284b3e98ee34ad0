"""Multi-stream (lane-batched LOCKSTEP) evaluation — the opt-in mode.

The reference parallelizes inference by giving each GPU a process and a
shard of videos (function/test_rcnn.py:69-75, tester.py:301-312). Two
TPU-native forms exist here:

  * TIME-MULTIPLEXED (the default since r5, eval/driver.py
    eval_videos_timeplex): streams round-robin through the single-lane
    GOP-scan program with per-stream device-resident carries — reuses
    the peak-FPS program for every frame. Round 4 measured lockstep
    lane batching as an aggregate pessimization (3 lanes cost 3.6x the
    single-lane window for 3x the frames).
  * LOCKSTEP lane batching (this module): B streams ride one batch axis
    through batch=B programs — one dispatch per step covers B frames,
    so it wins only when per-dispatch latency dominates compute
    (dispatch-bound hosts/tiny models). Sharding the lane axis over a
    mesh extends it across chips/hosts (the multi-chip inference-DP
    path, exercised by dryrun_multichip).

Lockstep scheduling: every video is padded to a multiple of the key-frame
interval, so all lanes are always at the same position within a GOP and
share one flag per step; a lane that starts a new video at a key step
raises its own is_first bootstrap flag (the per-lane ChooseOldKeyFeat).
Padding frames are marked invalid and their detections discarded.
"""

from __future__ import annotations

import numpy as np

from lsfa_tpu.data import coviar
from lsfa_tpu.data.image import pad_to_bucket, resize, transform_mv_res
from lsfa_tpu.data.loader import GOP_SIZE, _read_jpeg_bgr
from lsfa_tpu.eval.tester import StreamingDetector


def build_lane_playlists(video_roidb, lanes: int, interval: int):
    """Greedy length-balanced lane assignment; each video padded to a
    multiple of `interval`. Returns per-lane lists of
    (video_idx, frame_id, real)."""
    order = np.argsort([-r["frame_seg_len"] for r in video_roidb])
    playlists = [[] for _ in range(lanes)]
    loads = np.zeros(lanes)
    for vi in order:
        n = video_roidb[vi]["frame_seg_len"]
        padded = int(np.ceil(n / interval) * interval)
        lane = int(np.argmin(loads))
        pl = playlists[lane]
        for f in range(padded):
            fid = min(f, n - 1)
            pl.append((int(vi), fid, f < n))
        loads[lane] += padded
    # more lanes than videos: idle lanes replay video 0 as padding so the
    # fixed-batch programs always see `lanes` streams
    for pl in playlists:
        if not pl:
            pl.extend((int(order[0]), 0, False) for _ in range(interval))
    return playlists


class MultiStreamEvalLoader:
    """Yields lockstep lane-batched frames for StreamingDetector(batch=B).

    Ownership: one loader instance serves ONE iteration at a time — the
    per-lane decoder caches (`_prepared`, `_raw`) are instance state
    mutated from __iter__'s worker threads, so construct a fresh loader
    per run rather than iterating one instance concurrently (or
    re-iterating while a DevicePrefetcher still drains the previous
    generator)."""

    def __init__(self, video_roidb, cfg, lanes: int = 4, bucket_hw=None):
        self.roidb = video_roidb
        self.cfg = cfg
        self.lanes = lanes
        self.bucket_hw = bucket_hw or tuple(cfg.tpu.default_bucket)
        self.interval = cfg.TEST.KEY_FRAME_INTERVAL
        self.playlists = build_lane_playlists(video_roidb, lanes,
                                              self.interval)
        self.n_steps = max(len(p) for p in self.playlists)
        # per-LANE caches: an idle lane replays video 0 alongside the lane
        # that owns it, and decoder handles (+ their one-GOP caches) are
        # not thread-safe — so lanes never share a PreparedVideo. Steps are
        # sequential and each lane is decoded by exactly one pool task per
        # step, so per-lane dicts need no lock.
        self._prepared: list = [{} for _ in range(lanes)]
        # same per-lane isolation for the NON-prepared compressed fallback:
        # the module-level coviar.load shares one lru-cached handle, whose
        # lock would serialize lanes and whose one-GOP cache ping-pongs
        # when two lanes touch the same video at different GOPs (idle-lane
        # replay) — per-lane raw readers keep decode_workers effective on
        # this path too
        self._raw: list = [{} for _ in range(lanes)]
        from lsfa_tpu.data.loader import payload_dtype, prepared_available
        self._dtype = payload_dtype(cfg)
        # ONE wire format for every lane and step: lanes run lockstep
        # through np.concatenate and one jitted program, so mixing i420
        # prepared payloads with BGR fallbacks (JPEG-only recs, streams
        # shorter than frame_seg_len) must be impossible. i420 only when
        # every rec can serve prepared payloads; short-stream tail frames
        # are PACKED to i420 (data/image.py::bgr_to_i420).
        self._wire = "bgr8"
        if (getattr(cfg.tpu, "frame_payload", "bgr8") == "i420"
                and cfg.TEST.KEY_FRAME_INTERVAL % GOP_SIZE == 0
                and prepared_available()
                and all(rec.get("video_path") for rec in video_roidb)):
            self._wire = "i420"

    def _prepared_frame(self, lane, rec, fid):
        """C++ data-plane fast path; None when unavailable for this rec."""
        from lsfa_tpu.data.loader import PreparedVideo, prepared_available

        video = rec.get("video_path")
        if video is None or not prepared_available():
            return None
        cache = self._prepared[lane]
        pv = cache.pop(video, None)
        if pv is not None:
            cache[video] = pv              # LRU: re-insert as newest
        if pv is None:
            # bounded cache: each PreparedVideo holds a ~30 MB GOP cache;
            # a lane is on one video at a time, keep one of slack
            if len(cache) >= 2:
                cache.pop(next(iter(cache)))
            pv = PreparedVideo(video, self.cfg, self.bucket_hw,
                               wire_fmt=self._wire)
            cache[video] = pv
        if fid >= pv.num_frames:
            return None
        return pv.frame(fid)

    def _raw_reader(self, lane, video):
        """Per-lane VideoReader for the non-prepared fallback (bounded
        LRU mirroring the PreparedVideo caches)."""
        cache = self._raw[lane]
        r = cache.pop(video, None)
        if r is None:
            if len(cache) >= 2:
                cache.pop(next(iter(cache))).close()
            r = coviar.VideoReader(video)
        cache[video] = r
        return r

    def _frame(self, lane, rec, fid):
        cfg = self.cfg
        video = rec.get("video_path")
        if video is not None and coviar.available() \
                and fid < coviar.get_num_frames(video):
            gop, pos = fid // GOP_SIZE, fid % GOP_SIZE
            bgr, mv_g, res_g = self._raw_reader(lane, video).decode_gop(gop)
            im = bgr[pos].astype(np.float32)
            mv = -mv_g[pos].astype(np.float32)
            res = res_g[pos].astype(np.float32)
        else:
            im = _read_jpeg_bgr(rec["pattern"] % fid)
            mv = np.zeros(im.shape[:2] + (2,), np.float32)
            res = np.zeros(im.shape[:2] + (3,), np.float32)
        return im, mv, res

    def _lane_step(self, l, t):
        """Decode lane l's frame for step t. Returns
        (data, small, mv, res, info_row, (vi, fid, real)). Touches only
        this lane's prepared cache — safe to run lanes concurrently."""
        cfg = self.cfg
        target, max_size = cfg.SCALES[0]
        bh, bw = self.bucket_hw
        fb = (bh // 16, bw // 16)
        from lsfa_tpu.data.image import small_pool_factor
        s = small_pool_factor(cfg.network.small_net_stride)
        pl = self.playlists[l]
        vi, fid, real = pl[min(t, len(pl) - 1)]
        real = real and t < len(pl)
        rec = self.roidb[vi]
        prep = self._prepared_frame(l, rec, fid)
        if prep is not None:
            data, small, mv_p, res_p, info = prep
            return data, small, mv_p, res_p, list(info[0]), (vi, fid, real)
        im, mv, res = self._frame(l, rec, fid)
        im_r, im_scale = resize(im, target, max_size)
        data = pad_to_bucket(
            np.clip(np.round(im_r), 0, 255).astype(np.uint8)[None],
            self.bucket_hw)
        small = np.clip(np.round(data.astype(np.float32).reshape(
            1, bh // s, s, bw // s, s, 3).mean((2, 4))), 0,
            255).astype(np.uint8)
        if self._wire == "i420":
            # short-stream tail frame in an i420 run: pack so the
            # lane batch keeps one shape (see __init__)
            from lsfa_tpu.data.image import bgr_to_i420
            data = bgr_to_i420(data)
            small = bgr_to_i420(small)
        mv_t, res_t = transform_mv_res(
            mv, res, im_scale, cfg.network.PIXEL_MEANS,
            cfg.network.PIXEL_SCALE,
            legacy_swap=bool(getattr(cfg.network,
                                     "res_diff_legacy_swap", False)))
        return (data, small,
                pad_to_bucket(mv_t, fb).astype(self._dtype),
                pad_to_bucket(res_t, fb).astype(self._dtype),
                [im_r.shape[0], im_r.shape[1], im_scale],
                (vi, fid, real))

    def __iter__(self):
        # optional lane-parallel decode: the ctypes data plane releases
        # the GIL, so N workers scale decode ~linearly on an N-core
        # serving host (tpu.decode_workers=0 keeps the 1-core serial
        # path; outputs are identical either way — lanes are independent
        # and results are reassembled in lane order)
        workers = int(getattr(self.cfg.tpu, "decode_workers", 0))
        pool = None
        if workers > 1 and self.lanes > 1:
            from concurrent.futures import ThreadPoolExecutor
            pool = ThreadPoolExecutor(max_workers=min(workers, self.lanes))
        prev_video = [-1] * self.lanes
        try:
            for t in range(self.n_steps):
                flag = 0 if t == 0 else (1 if t % self.interval == 0 else 2)
                if pool is not None:
                    rows = list(pool.map(lambda l: self._lane_step(l, t),
                                         range(self.lanes)))
                else:
                    rows = [self._lane_step(l, t)
                            for l in range(self.lanes)]
                is_first = np.zeros(self.lanes, np.float32)
                for l, row in enumerate(rows):
                    vi = row[5][0]
                    if flag in (0, 1) and vi != prev_video[l]:
                        is_first[l] = 1.0
                        prev_video[l] = vi
                yield {
                    "flag": flag,
                    "is_first": is_first,
                    "data": np.concatenate([r[0] for r in rows]),
                    "small": np.concatenate([r[1] for r in rows]),
                    "motion_vector": np.concatenate([r[2] for r in rows]),
                    "res_diff": np.concatenate([r[3] for r in rows]),
                    "im_info": np.asarray([r[4] for r in rows], np.float32),
                    "lane_meta": [r[5] for r in rows],
                }
        finally:
            if pool is not None:
                pool.shutdown()


def eval_videos_multistream(model, variables, cfg, video_roidb,
                            lanes: int = 4, logger=None,
                            max_steps: int | None = None, mesh=None,
                            bucket_hw=None, stats: dict | None = None):
    """Lane-batched streaming detection. Returns
    {(video_idx, frame_id) -> {labels, scores, boxes}}.

    mesh: shard the lane axis over a device mesh (lanes % mesh size == 0)
    — multi-chip inference DP, replacing the reference's per-GPU process
    sharding (function/test_rcnn.py:69-75).

    stats: optional dict that receives {"steps": N} — the lockstep steps
    actually run (each = `lanes` frames of device work incl. idle-lane
    padding), so callers with a frame budget can charge real work."""
    from lsfa_tpu.data.prefetch import DevicePrefetcher

    log = logger.info if logger else print
    h, w = bucket_hw or cfg.tpu.default_bucket
    det = StreamingDetector(model, variables, cfg, (h, w), batch=lanes,
                            mesh=mesh)
    loader = DevicePrefetcher(
        MultiStreamEvalLoader(video_roidb, cfg, lanes=lanes,
                              bucket_hw=(h, w)), depth=2,
        keys=("data", "small", "motion_vector", "res_diff", "im_info"))
    detections = {}
    steps_run = 0
    for step, item in enumerate(loader):
        steps_run = step + 1
        d, v = det.process_frame(
            item["data"], item["im_info"], item["motion_vector"],
            item["res_diff"], flag=item["flag"], small=item["small"],
            is_first=item["is_first"])
        d = np.asarray(d)
        v = np.asarray(v)
        for l, (vi, fid, real) in enumerate(item["lane_meta"]):
            if not real:
                continue
            dl = d[l][v[l]]
            detections[(vi, fid)] = {
                "labels": dl[:, 0].astype(int), "scores": dl[:, 1],
                "boxes": dl[:, 2:6]}
        if max_steps is not None and step + 1 >= max_steps:
            break
    if stats is not None:
        stats["steps"] = steps_run
    log(f"multistream eval: {len(detections)} frames over {lanes} lanes")
    return detections
