#!/usr/bin/env python
"""Content-dependence of the prepared C decode path (host-only, no TPU).

The headline bench clip is a gradient+moving-squares scene; MPEG-4 decode
cost is content-dependent (round-2 review: "the decode half of the
headline rests on one easy clip"), so this measures the SAME prepared
decode the bench uses — PreparedVideo.gop() with the production config —
over clips spanning the difficulty range:

  easy   the bench clip (smooth gradient + 2 moving squares, seed 3)
  synth  the training-dataset generator's multi-object scenes
         (lsfa_tpu/data/synth.py — textured background, 3 moving objects)
  hard   textured moving patches over a textured background with
         per-frame sensor noise: dense motion vectors + full-frame
         residual energy, the decode worst case

Prints per-clip ms/frame (median of PASSES full-clip sweeps), the bitrate
(decode cost tracks encoded bits), and the per-stage breakdown from
VideoReader.prof_read(). Run on an IDLE host: the 1-core box inflates
timings ~linearly with any background job.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from lsfa_tpu.config import get_default_config
from lsfa_tpu.data import coviar
from lsfa_tpu.data.loader import PreparedVideo

W, H, N_GOPS, GOP = 960, 576, 12, 12
PASSES = 3


def make_hard_clip(path):
    rng = np.random.default_rng(11)
    n = N_GOPS * GOP
    base = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
    # 6 textured patches on looping diagonal tracks
    patches = [rng.integers(0, 255, (96, 96, 3)).astype(np.uint8)
               for _ in range(6)]
    starts = rng.integers(0, 400, (6, 2))
    vels = rng.integers(-7, 8, (6, 2))
    frames = np.empty((n, H, W, 3), np.uint8)
    for t in range(n):
        f = base.copy()
        for p, (sy, sx), (vy, vx) in zip(patches, starts, vels):
            y = int(sy + vy * t) % (H - 96)
            x = int(sx + vx * t) % (W - 96)
            f[y:y + 96, x:x + 96] = p
        noise = rng.integers(-8, 9, (H, W, 3))
        frames[t] = np.clip(f.astype(np.int16) + noise, 0, 255)
    coviar.encode_frames(path, frames, gop_size=GOP)


def make_synth_clip(path):
    from lsfa_tpu.data.synth import render_video
    rng = np.random.default_rng(5)
    frames, _ = render_video(W, H, N_GOPS * GOP, rng, min_objects=3,
                             max_objects=3)
    coviar.encode_frames(path, np.asarray(frames, np.uint8), gop_size=GOP)


def measure(path):
    cfg = get_default_config()
    pv = PreparedVideo(path, cfg, tuple(cfg.tpu.default_bucket))
    n_gops = pv.num_frames // GOP
    pv.gop(0)                                 # one-time FFmpeg warmup
    pv.reader.prof_read()
    times = []
    for _ in range(PASSES):
        pv._gop = -1
        t0 = time.perf_counter()
        for g in range(n_gops):
            pv.gop(g)
            pv._gop = -1
        times.append((time.perf_counter() - t0) / (n_gops * GOP) * 1e3)
    prof = pv.reader.prof_read()
    nf = n_gops * GOP * PASSES
    # keep zero-valued stages: "frame_to_bgr 0.0" is exactly the signal
    # the direct-YUV optimizations exist to demonstrate
    stages = {k: round(v / nf * 1e3, 2) for k, v in prof.items()}
    kbps = os.path.getsize(path) * 8 / (n_gops * GOP) / 1000
    return float(np.median(times)), kbps, stages


def main():
    clips = {}
    easy = "/tmp/lsfa_bench_clip.mp4"
    if not os.path.exists(easy):
        coviar.encode_test_video(easy, n_frames=N_GOPS * GOP, w=W, h=H,
                                 gop_size=GOP, seed=3)
    clips["easy (bench clip)"] = easy
    synth = "/tmp/lsfa_decode_synth.mp4"
    if not os.path.exists(synth):
        make_synth_clip(synth)
    clips["synth (3-object scenes)"] = synth
    hard = "/tmp/lsfa_decode_hard.mp4"
    if not os.path.exists(hard):
        make_hard_clip(hard)
    clips["hard (texture+noise)"] = hard
    for extra in sys.argv[1:]:
        clips[os.path.basename(extra)] = extra

    for name, path in clips.items():
        ms, kbps, stages = measure(path)
        print(f"{name:28s}: {ms:5.2f} ms/f  ({kbps:7.0f} kbit/frame)  "
              f"{stages}")


if __name__ == "__main__":
    main()
