"""Train/test batch assembly + async prefetch.

Behavioral targets:
  * get_pair_image (lib/utils/image.py:92-200): per training sample decode
    the current frame, its GOP key frame ("ref") and the previous GOP's
    key ("old ref") from the compressed stream, plus accumulated MV and
    residual; eq_flag=1 when cur==key (key frames train the key path),
    eq_flag_old=1 when old-ref==ref (first GOP);
  * AnchorLoader batching (dff_rfcn/core/loader.py:143-377) — but anchor
    labeling happens ON DEVICE inside the train step here, so the host
    ships only images/MV/residual/gt;
  * TestLoader frame iteration + key schedule (core/loader.py:24-141);
  * MultiThreadPrefetchingIter (lib/utils/PrefetchingIter.py) — replaced
    by a double-buffered thread prefetcher feeding device puts.

TPU redesign: every tensor is padded to a fixed (H, W) bucket so the
jitted programs never recompile; gt boxes ride as (max_gt, 5) + validity.
"""

from __future__ import annotations

import os
import queue
import threading

import numpy as np
from PIL import Image

from lsfa_tpu.data import coviar
from lsfa_tpu.data.image import (
    pad_to_bucket,
    pick_bucket,
    resize,
    small_pool_factor,
    transform_mv_res,
)

GOP_SIZE = 12


def payload_dtype(cfg) -> np.dtype:
    """dtype MV/residual payloads ship in (cfg.tpu.mv_res_dtype).

    float16 (default): half the host->device traffic, ample precision for
    values spanning ~±400 — and, decisive on the axon tunnel runtime,
    the f32-input variants of the compiled eval programs reproducibly
    fault the backend (bisected 2026-08-16). float32 restores the
    reference's full-precision chain on sane runtimes; the detection
    delta between the two is bounded by tests/test_payload_dtype.py."""
    return np.dtype(getattr(cfg.tpu, "mv_res_dtype", "float16"))


def _read_jpeg_bgr(path: str) -> np.ndarray:
    im = np.asarray(Image.open(path).convert("RGB"), np.uint8)
    return im[:, :, ::-1].astype(np.float32)


def load_pair_sample(rec, cfg, rng: np.random.Generator, bucket_hw=None):
    """One training sample following the get_pair_image contract.

    Returns dict of host arrays: data/data_ref/data_ref_old (1,H,W,3 NHWC),
    eq_flag, eq_flag_old, motion_vector (1,fh,fw,2), res_diff (1,fh,fw,3),
    im_info (3,), gt_boxes (G,5 scaled).

    When `bucket_hw` is given and the C++ data plane is built, the whole
    sample (3 frames + MV/residual grids, flip included) comes from ONE
    native call (~12x the Python chain) with bucket-shaped outputs.
    """
    means = cfg.network.PIXEL_MEANS
    scale = cfg.network.PIXEL_SCALE
    eq_flag, eq_flag_old = 0.0, 0.0
    im_h, im_w = int(rec["height"]), int(rec["width"])
    mv = np.zeros((im_h, im_w, 2), np.float32)
    res = np.zeros((im_h, im_w, 3), np.float32)

    video = rec.get("video_path")
    use_video = ("pattern" in rec) and coviar.available()
    if use_video and not (video and os.path.exists(video)):
        # the reference asserts with a clear message (lib/utils/image.py:130)
        raise FileNotFoundError(
            f"video record {rec.get('image', '?')} has no readable "
            f"compressed stream (video_path={video!r})")

    # ---- native fast path -------------------------------------------------
    if (use_video and bucket_hw is not None and prepared_available()
            and rec["frame_seg_id"] < coviar.get_num_frames(video)):
        cur_id = rec["frame_seg_id"]
        target, max_size = cfg.SCALES[int(rng.integers(len(cfg.SCALES)))]
        r = coviar._reader(video)
        data, ref, old, mv_t, res_t, info, pos = r.decode_train_sample(
            cur_id, bucket_hw, target, max_size, means, scale,
            stride=cfg.network.RCNN_FEAT_STRIDE,
            legacy_swap=bool(getattr(cfg.network,
                                     "res_diff_legacy_swap", False)),
            flip=bool(rec.get("flipped")))
        ref_id = int(np.clip(
            cur_id + rng.integers(cfg.TRAIN.MIN_OFFSET,
                                  cfg.TRAIN.MAX_OFFSET + 1),
            0, rec["frame_seg_len"] - 1))
        if pos == 0 or ref_id == cur_id:       # degenerate pair: key path
            eq_flag = 1.0
            ref = old = data
            mv_t = np.zeros_like(mv_t)
            res_t = zero_residual_grid(
                res_t.shape, info, means, scale,
                cfg.network.RCNN_FEAT_STRIDE,
                legacy_swap=bool(getattr(cfg.network,
                                         "res_diff_legacy_swap", False)))
        elif cur_id - pos == 0:                # first GOP: old ref == ref
            eq_flag_old = 1.0
        if (eq_flag == 0.0 and "oracle" in rec
                and getattr(cfg.network, "oracle_mv", False)):
            # oracle-warp rung: the generator's analytic GT flow replaces
            # the decoded MV grid (same shape/units — data/oracle_flow.py)
            from lsfa_tpu.data.oracle_flow import oracle_mv_grid
            mv_t = oracle_mv_grid(
                rec["oracle"], cur_id, cur_id - pos, mv_t.shape[0],
                mv_t.shape[1], float(info[2]),
                cfg.network.RCNN_FEAT_STRIDE, (im_h, im_w),
                flip=bool(rec.get("flipped")))
        im_scale = float(info[2])
        # roidb boxes are already stored flipped (append_flipped)
        boxes = rec["boxes"] * im_scale
        gt = np.concatenate(
            [boxes, rec["gt_classes"][:, None].astype(np.float32)], axis=1)
        return {
            "data": data[None], "data_ref": ref[None],
            "data_ref_old": old[None],
            "eq_flag": eq_flag, "eq_flag_old": eq_flag_old,
            "motion_vector": mv_t[None], "res_diff": res_t[None],
            "im_info": np.asarray([info[0], info[1], im_scale], np.float32),
            "gt_boxes": gt,
        }

    if use_video:
        cur_id = rec["frame_seg_id"]
        gop_id, pos_id = cur_id // GOP_SIZE, cur_id % GOP_SIZE
        n_frames = coviar.get_num_frames(video)
        # random ref offset in [MIN_OFFSET, MAX_OFFSET] (image.py:124)
        ref_id = int(np.clip(
            cur_id + rng.integers(cfg.TRAIN.MIN_OFFSET, cfg.TRAIN.MAX_OFFSET + 1),
            0, rec["frame_seg_len"] - 1))
        if cur_id >= n_frames:          # stream shorter than the annotation
            im = _read_jpeg_bgr(rec["image"])
            ref = old_ref = im.copy()
            eq_flag = 1.0
        else:
            im = coviar.load(video, gop_id, pos_id, 0).astype(np.float32)
            if pos_id == 0 or ref_id == cur_id:
                ref = old_ref = im.copy()
                eq_flag = 1.0
            else:
                ref_gop = gop_id
                old_gop = max(ref_gop - 1, 0)
                eq_flag_old = 1.0 if old_gop == ref_gop else 0.0
                ref_pos = 0
                ref = coviar.load(video, ref_gop, ref_pos, 0).astype(np.float32)
                old_ref = coviar.load(video, old_gop, ref_pos, 0).astype(np.float32)
                mv = -coviar.load(video, gop_id, pos_id, 1).astype(np.float32)
                res = coviar.load(video, gop_id, pos_id, 2).astype(np.float32)
    else:
        im = _read_jpeg_bgr(rec["image"])
        ref = old_ref = im.copy()
        eq_flag = 1.0

    if rec.get("flipped"):
        im = im[:, ::-1]
        ref = ref[:, ::-1]
        old_ref = old_ref[:, ::-1]
        mv = mv[:, ::-1].copy()
        mv[:, :, 0] = -mv[:, :, 0]
        res = res[:, ::-1]

    # multi-scale: sample one entry of SCALES per image
    # (lib/utils/image.py:183 random.randrange(len(config.SCALES)))
    target, max_size = cfg.SCALES[int(rng.integers(len(cfg.SCALES)))]
    # raw resized BGR — normalization (transform) runs ON DEVICE
    im_r, im_scale = resize(im, target, max_size)
    ref_r, _ = resize(ref, target, max_size)
    old_r, _ = resize(old_ref, target, max_size)
    data = im_r[None].astype(np.float32)
    data_ref = ref_r[None].astype(np.float32)
    data_old = old_r[None].astype(np.float32)
    mv_t, res_t = transform_mv_res(
        mv, res, im_scale, means, scale, cfg.network.RCNN_FEAT_STRIDE,
        legacy_swap=bool(getattr(cfg.network, "res_diff_legacy_swap", False)))

    boxes = rec["boxes"] * im_scale
    gt = np.concatenate(
        [boxes, rec["gt_classes"][:, None].astype(np.float32)], axis=1)
    im_info = np.asarray(
        [data.shape[1], data.shape[2], im_scale], np.float32)
    return {
        "data": data, "data_ref": data_ref, "data_ref_old": data_old,
        "eq_flag": eq_flag, "eq_flag_old": eq_flag_old,
        "motion_vector": mv_t, "res_diff": res_t,
        "im_info": im_info, "gt_boxes": gt,
    }


def zero_residual_grid(shape, info, pixel_means, pixel_scale,
                       stride: int = 16, legacy_swap: bool = False):
    """The residual grid a ZERO raw residual produces: the channel
    transform runs after padding, so valid cells carry (0 - mean)*scale
    constants, not zeros (transform_mv_res semantics — what the reference
    feeds at I-frames / degenerate pairs). Bucket-pad cells stay zero."""
    fh, fw, _ = shape
    sh, sw = float(info[0]), float(info[1])
    gh = int(np.ceil(sh / stride))
    gw = int(np.ceil(sw / stride))
    mB, mG, mR = [float(m) for m in pixel_means]
    o0 = (0.0 - mR) * pixel_scale
    o1 = (0.0 - mG) * pixel_scale
    o2 = ((o0 - mB) * pixel_scale if legacy_swap
          else (0.0 - mB) * pixel_scale)
    out = np.zeros((fh, fw, 3), np.float32)
    out[:gh, :gw] = (o0, o1, o2)
    return out


def collate_train_batch(samples, bucket_hw, max_gt: int = 100,
                        mv_res_dtype=np.float16):
    """Stack samples into one fixed-shape device batch."""
    bh, bw = bucket_hw
    fb = (bh // 16, bw // 16)
    b = len(samples)
    out = {
        "data": np.concatenate(
            [pad_to_bucket(s["data"], bucket_hw) for s in samples]),
        "data_ref": np.concatenate(
            [pad_to_bucket(s["data_ref"], bucket_hw) for s in samples]),
        "data_ref_old": np.concatenate(
            [pad_to_bucket(s["data_ref_old"], bucket_hw) for s in samples]),
        # payload dtype is config-gated (see payload_dtype)
        "motion_vector": np.concatenate(
            [pad_to_bucket(s["motion_vector"], fb) for s in samples]
        ).astype(mv_res_dtype),
        "res_diff": np.concatenate(
            [pad_to_bucket(s["res_diff"], fb) for s in samples]
        ).astype(mv_res_dtype),
        "eq_flag": np.asarray([s["eq_flag"] for s in samples], np.float32),
        "eq_flag_old": np.asarray([s["eq_flag_old"] for s in samples],
                                  np.float32),
        "im_info": np.stack([s["im_info"] for s in samples]),
    }
    gt = np.zeros((b, max_gt, 5), np.float32)
    gtv = np.zeros((b, max_gt), bool)
    for i, s in enumerate(samples):
        g = min(len(s["gt_boxes"]), max_gt)
        gt[i, :g] = s["gt_boxes"][:g]
        gtv[i, :g] = True
    out["gt_boxes"] = gt
    out["gt_valid"] = gtv
    return out


class TrainLoader:
    """Shuffling epoch iterator with thread prefetch (replaces
    AnchorLoader + MultiThreadPrefetchingIter).

    ASPECT_GROUPING (dff_rfcn/core/loader.py:220-240): records are grouped
    by the image bucket their resized shape fits (portrait vs landscape),
    every batch is drawn from one group, and the jit cache holds one
    program per bucket. Grouping is structural here — XLA needs static
    shapes — so it applies regardless of the knob; TRAIN.ASPECT_GROUPING
    only controls whether batch ORDER is interleaved across groups
    (True, the reference's behavior) or groups run back-to-back."""

    def __init__(self, roidb, cfg, batch_size: int, bucket_hw=None,
                 seed: int = 0, prefetch: int = 2, num_workers: int = 2):
        self.roidb = roidb
        self.cfg = cfg
        self.batch_size = batch_size
        self.max_gt = cfg.tpu.max_gt_boxes
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch
        self.num_workers = num_workers
        if bucket_hw is not None:
            self.buckets = [tuple(bucket_hw)]
        else:
            self.buckets = [tuple(b) for b in cfg.tpu.image_buckets]
        # bucket per record under the LARGEST scale (any sampled SCALES
        # entry then fits, since smaller scales shrink the resized image)
        tgt = max(s[0] for s in cfg.SCALES)
        mx = max(s[1] for s in cfg.SCALES)
        self._rec_bucket = np.asarray([
            self.buckets.index(pick_bucket(
                int(r["height"]), int(r["width"]), self.buckets, tgt, mx))
            for r in roidb])

    def __len__(self):
        return sum(
            int(np.sum(self._rec_bucket == bi)) // self.batch_size
            for bi in range(len(self.buckets)))

    def _epoch_batches(self):
        """List of (bucket_idx, record_indices) per batch."""
        batches = []
        for bi in range(len(self.buckets)):
            idxs = np.nonzero(self._rec_bucket == bi)[0]
            if self.cfg.TRAIN.SHUFFLE:
                self.rng.shuffle(idxs)
            nb = len(idxs) // self.batch_size
            for i in range(nb):
                batches.append(
                    (bi, idxs[i * self.batch_size:(i + 1) * self.batch_size]))
        if self.cfg.TRAIN.SHUFFLE and self.cfg.TRAIN.ASPECT_GROUPING:
            self.rng.shuffle(batches)
        return batches

    def __iter__(self):
        batches = self._epoch_batches()
        nb = len(batches)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        idx_q: queue.Queue = queue.Queue()
        for item in batches:
            idx_q.put(item)
        # per-worker RNG seeded BEFORE thread start — np.random.Generator
        # is not thread-safe, so workers never share one
        seeds = [int(self.rng.integers(2**31)) for _ in range(self.num_workers)]

        def worker(wid):
            wrng = np.random.default_rng(seeds[wid])
            while True:
                try:
                    bi, idxs = idx_q.get_nowait()
                except queue.Empty:
                    return
                try:
                    samples = [load_pair_sample(self.roidb[j], self.cfg,
                                                wrng,
                                                bucket_hw=self.buckets[bi])
                               for j in idxs]
                    q.put(collate_train_batch(
                        samples, self.buckets[bi], self.max_gt,
                        mv_res_dtype=payload_dtype(self.cfg)))
                except BaseException as e:    # surface in the main thread
                    q.put(e)                  # (a dead worker would hang
                    return                    # the epoch on q.get())

        threads = [threading.Thread(target=worker, args=(w,), daemon=True)
                   for w in range(self.num_workers)]
        for t in threads:
            t.start()
        for _ in range(nb):
            item = q.get()
            if isinstance(item, BaseException):
                raise item
            yield item


class PreparedVideo:
    """Per-video handle over the C++ prepared-decode data plane: one call
    decodes a whole GOP straight to device-ready payloads (frames, smalls,
    MV/residual grids) — ~10x the Python preprocess chain on one core.
    Frames are served from a one-GOP cache."""

    def __init__(self, video_path: str, cfg, bucket_hw,
                 frames_mode: int | None = None,
                 wire_fmt: str | None = None, oracle=None):
        """frames_mode: override the full-res policy — 0 ships every
        frame full-res (required by single-frame detectors like the RFCN
        baseline), 1 key frames only; None picks by the key schedule.
        wire_fmt: override cfg.tpu.frame_payload (loaders that must keep
        one wire format across heterogeneous videos/lanes pass 'bgr8').
        oracle: analytic motion state (rec["oracle"]) — decoded MV grids
        are replaced by the generator's GT flow (oracle-warp rung,
        data/oracle_flow.py)."""
        self.reader = coviar.VideoReader(video_path)
        self.cfg = cfg
        self.bucket_hw = tuple(bucket_hw)
        self.num_frames = self.reader.num_frames
        self.frames_mode = frames_mode
        self.wire_fmt = wire_fmt
        self.oracle = oracle
        self._gop = -1
        self._cache = None

    def _mode(self) -> int:
        # key frames land on GOP starts when the key interval divides
        # the GOP size — then only the key frame needs a full-res
        # resize (frames_mode=1 skips 11/12 of the sws work; non-key
        # frames ship small+MV+residual only)
        if self.frames_mode is not None:
            return self.frames_mode
        return 1 if self.cfg.TEST.KEY_FRAME_INTERVAL % GOP_SIZE == 0 else 0

    @property
    def wire_format(self) -> str:
        """The RESOLVED frame/small payload format this handle serves —
        callers that mix prepared payloads with host-chain fallbacks must
        match it (see data/image.py::bgr_to_i420)."""
        # i420 wire format halves shipped bytes but only exists for
        # the key-only decode mode (full-frame consumers need BGR)
        if self._mode() != 1:
            return "bgr8"
        if self.wire_fmt is not None:
            return self.wire_fmt
        return getattr(self.cfg.tpu, "frame_payload", "bgr8")

    def gop(self, gop_idx: int):
        if gop_idx != self._gop:
            cfg = self.cfg
            target, max_size = cfg.SCALES[0]
            mode = self._mode()
            fmt = self.wire_format
            small_src = getattr(cfg.tpu, "small_src", "bgr")
            res_src = getattr(cfg.tpu, "res_src", "bgr")
            if fmt != "i420":
                small_src = "bgr"       # direct-YUV paths are i420-only
                res_src = "bgr"
            self._cache = self.reader.decode_gop_prepared(
                gop_idx, self.bucket_hw, target, max_size,
                cfg.network.PIXEL_MEANS, cfg.network.PIXEL_SCALE,
                stride=cfg.network.RCNN_FEAT_STRIDE,
                small_factor=small_pool_factor(cfg.network.small_net_stride),
                legacy_swap=bool(getattr(cfg.network,
                                         "res_diff_legacy_swap", False)),
                frames_mode=mode, payload_fmt=fmt, small_src=small_src,
                res_src=res_src)
            if self.oracle is not None:
                from lsfa_tpu.data.oracle_flow import substitute_gop_mv
                frames, smalls, mv, res, info = self._cache
                mv = substitute_gop_mv(
                    mv, self.oracle, gop_idx * GOP_SIZE, float(info[2]),
                    cfg.network.RCNN_FEAT_STRIDE,
                    (self.reader.height, self.reader.width))
                self._cache = (frames, smalls, mv, res, info)
            self._gop = gop_idx
        return self._cache

    def frame(self, fid: int):
        """(data (1,bh,bw,3) u8, small (1,...) u8, mv (1,fh,fw,2),
        res (1,fh,fw,3) in payload_dtype, im_info (1,3) f32)."""
        gop, pos = fid // GOP_SIZE, fid % GOP_SIZE
        frames, smalls, mv, res, info = self.gop(gop)
        dt = payload_dtype(self.cfg)
        return (frames[pos:pos + 1], smalls[pos:pos + 1],
                mv[pos:pos + 1].astype(dt),
                res[pos:pos + 1].astype(dt), info[None])


def prepared_available() -> bool:
    lib = coviar._lib() if coviar.available() else None
    return (lib is not None
            and hasattr(lib, "coviar_decode_gop_prepared_mode")
            and hasattr(lib, "coviar_decode_train_sample"))


class EvalLoader:
    """Frame-by-frame video iterator with the key-frame schedule
    (core/loader.py:24-141). Yields dicts the StreamingDetector consumes."""

    def __init__(self, video_roidb, cfg, bucket_hw=None,
                 full_frames: bool = False):
        """full_frames: every frame ships full-res `data` (single-frame
        detectors); default lets the prepared path skip non-key resizes."""
        self.roidb = video_roidb          # one rec per video (seg_len frames)
        self.cfg = cfg
        self.bucket_hw = bucket_hw or tuple(cfg.tpu.default_bucket)
        self.key_interval = cfg.TEST.KEY_FRAME_INTERVAL
        self.full_frames = full_frames

    def __iter__(self):
        cfg = self.cfg
        means = cfg.network.PIXEL_MEANS
        pscale = cfg.network.PIXEL_SCALE
        target, max_size = cfg.SCALES[0]
        fb = (self.bucket_hw[0] // 16, self.bucket_hw[1] // 16)
        for vid_idx, rec in enumerate(self.roidb):
            n = rec["frame_seg_len"]
            # partial-GOP tail recs from the GOP-scan driver: skip the
            # frames the scan already covered instead of decoding the
            # whole video again just to drop its prefix
            start = int(rec.get("_tail_start", 0))
            video = rec.get("video_path")
            use_video = video is not None and coviar.available()
            prep = (PreparedVideo(video, cfg, self.bucket_hw,
                                  frames_mode=0 if self.full_frames
                                  else None,
                                  oracle=rec.get("oracle")
                                  if getattr(cfg.network, "oracle_mv",
                                             False) else None)
                    if use_video and prepared_available() else None)
            for fid in range(start, n):
                if fid == 0:
                    flag = 0
                elif fid % self.key_interval == 0:
                    flag = 1
                else:
                    flag = 2
                if prep is not None and fid < prep.num_frames:
                    # C++ data plane: device-ready payloads, no numpy/PIL
                    data, small, mv_t, res_t, info = prep.frame(fid)
                    yield {
                        "video_index": vid_idx, "frame_id": fid,
                        "flag": flag, "data": data, "small": small,
                        "im_info": info, "motion_vector": mv_t,
                        "res_diff": res_t,
                    }
                    continue
                mv = res = None
                if use_video and fid < coviar.get_num_frames(video):
                    gop, pos = fid // GOP_SIZE, fid % GOP_SIZE
                    im = coviar.load(video, gop, pos, 0).astype(np.float32)
                    if flag == 2:
                        mv = -coviar.load(video, gop, pos, 1).astype(np.float32)
                        res = coviar.load(video, gop, pos, 2).astype(np.float32)
                else:
                    im = _read_jpeg_bgr(rec["pattern"] % fid)
                im_r, im_scale = resize(im, target, max_size)
                # raw BGR uint8, padded to the bucket (on-device normalize)
                data = pad_to_bucket(
                    np.clip(np.round(im_r), 0, 255).astype(np.uint8)[None],
                    self.bucket_hw)
                # 1/stride block-mean of the padded frame for the small net
                from lsfa_tpu.data.image import bgr_to_i420, small_pool_factor
                s = small_pool_factor(self.cfg.network.small_net_stride)
                bh, bw = self.bucket_hw
                small = np.clip(np.round(data.astype(np.float32).reshape(
                    1, bh // s, s, bw // s, s, 3).mean((2, 4))), 0,
                    255).astype(np.uint8)
                if prep is not None and prep.wire_format == "i420":
                    # keep the video's wire format uniform: the prepared
                    # frames of this video shipped planar i420, so the
                    # host-chain tail frames must too (one jitted program
                    # per shape — a mid-video format flip would recompile)
                    data = bgr_to_i420(data)
                    small = bgr_to_i420(small)
                if mv is None:
                    h, w = im.shape[:2]
                    mv = np.zeros((h, w, 2), np.float32)
                    res = np.zeros((h, w, 3), np.float32)
                mv_t, res_t = transform_mv_res(
                    mv, res, im_scale, means, pscale,
                    legacy_swap=bool(getattr(cfg.network,
                                             "res_diff_legacy_swap", False)))
                dt = payload_dtype(cfg)
                yield {
                    "video_index": vid_idx, "frame_id": fid, "flag": flag,
                    "data": data,
                    "small": small,
                    "im_info": np.asarray(
                        [[im_r.shape[0], im_r.shape[1], im_scale]], np.float32),
                    # payload dtype is config-gated (see payload_dtype)
                    "motion_vector": pad_to_bucket(mv_t, fb).astype(dt),
                    "res_diff": pad_to_bucket(res_t, fb).astype(dt),
                }
