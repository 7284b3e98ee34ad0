#!/usr/bin/env python
"""Streaming demo: run LSFA over an MPEG-4 clip (or a JPEG directory) and
write annotated frames.

Reference role: dff_rfcn/demo.py (key/cur streaming over frames). The
default mode drives the compressed stream directly (MV/residual from the
video); --frames <dir> reproduces the reference's JPEG-directory input
(DFF-style: zero MV/residual, key features refreshed every interval).

Usage:
  python experiments/demo.py --cfg configs/lsfa_resnet101_vid.yaml \
      --video clip.mp4 --out out_frames/ [--ckpt <dir>] [--synthesize]
  python experiments/demo.py --cfg ... --frames /path/to/jpegs --out out/
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
    ap.add_argument("--video", default=None)
    ap.add_argument("--frames", default=None,
                    help="JPEG directory input (reference demo.py mode)")
    ap.add_argument("--out", default="demo_out")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--max-frames", type=int, default=48)
    ap.add_argument("--synthesize", action="store_true",
                    help="create a synthetic test clip at --video first")
    args = ap.parse_args()

    from lsfa_tpu.config import load_config
    from lsfa_tpu.data import coviar
    from lsfa_tpu.data.image import pad_to_bucket, resize, transform_mv_res
    from lsfa_tpu.eval.tester import StreamingDetector, collect_detections
    from lsfa_tpu.train.checkpoint import load_checkpoint
    from lsfa_tpu.train.driver import init_model
    from lsfa_tpu.utils.vis import draw_detections

    cfg = load_config(args.cfg)
    if not args.video and not args.frames:
        ap.error("one of --video / --frames is required")
    if args.synthesize and args.video:
        coviar.encode_test_video(args.video, n_frames=args.max_frames,
                                 w=320, h=240, gop_size=12, seed=0)
    model, params, batch_stats = init_model(cfg)
    if args.ckpt:
        restored, _ = load_checkpoint(args.ckpt)
        params = restored["params"]
        batch_stats = restored.get("batch_stats", batch_stats)
    variables = {"params": params, "batch_stats": batch_stats}

    bucket = tuple(cfg.tpu.default_bucket)
    det = StreamingDetector(model, variables, cfg, bucket)
    os.makedirs(args.out, exist_ok=True)
    jpegs = None
    if args.frames:
        jpegs = sorted(
            os.path.join(args.frames, f) for f in os.listdir(args.frames)
            if f.lower().endswith((".jpg", ".jpeg", ".png")))
        if not jpegs:
            ap.error(f"no image files under {args.frames}")
        n = min(len(jpegs), args.max_frames)
    else:
        n = min(coviar.get_num_frames(args.video), args.max_frames)
    target, max_size = cfg.SCALES[0]
    fb = (bucket[0] // 16, bucket[1] // 16)
    for fid in range(n):
        flag = det.key_frame_flag(fid)
        if jpegs is not None:
            # JPEG-directory mode (reference demo.py): no compressed-domain
            # signals; non-key frames rely on the cached key feature alone
            from lsfa_tpu.data.loader import _read_jpeg_bgr
            im = _read_jpeg_bgr(jpegs[fid])
            mv = np.zeros(im.shape[:2] + (2,), np.float32)
            res = np.zeros(im.shape[:2] + (3,), np.float32)
        else:
            gop, pos = fid // 12, fid % 12
            im = coviar.load(args.video, gop, pos, 0).astype(np.float32)
            mv = -coviar.load(args.video, gop, pos, 1).astype(np.float32)
            res = coviar.load(args.video, gop, pos, 2).astype(np.float32)
        im_r, im_scale = resize(im, target, max_size)
        # raw resized BGR uint8; normalization happens on device
        data = pad_to_bucket(
            np.clip(np.round(im_r), 0, 255).astype(np.uint8)[None], bucket)
        mv_t, res_t = transform_mv_res(mv, res, im_scale,
                                       cfg.network.PIXEL_MEANS,
                                       cfg.network.PIXEL_SCALE)
        im_info = np.asarray([[im_r.shape[0], im_r.shape[1], im_scale]],
                             np.float32)
        d, v = det.process_frame(data, im_info, pad_to_bucket(mv_t, fb),
                                 pad_to_bucket(res_t, fb), flag=flag)
        frame_rgb = im[:, :, ::-1]  # BGR -> RGB
        out = draw_detections(frame_rgb, collect_detections(d, v))
        out.save(os.path.join(args.out, f"{fid:06d}.png"))
        print(f"frame {fid} flag={flag} dets={int(np.asarray(v).sum())}")


if __name__ == "__main__":
    main()
