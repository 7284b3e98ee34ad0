#!/usr/bin/env python
"""Aggregate serving throughput: B parallel video streams per chip.

Single-stream FPS (bench.py) is the latency-bound headline; this measures
the lane-batched mode (eval_videos_multistream's configuration) where B
streams ride one batch axis — the per-dispatch and per-frame fixed costs
amortize across lanes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lsfa_tpu.utils.env import setup_cache

setup_cache()

import numpy as np
import jax
import jax.numpy as jnp

from lsfa_tpu.config import get_default_config
from lsfa_tpu.eval.tester import StreamingDetector
from lsfa_tpu.models.lsfa import lsfa_from_config


def main(lanes=4):
    cfg = get_default_config()
    model = lsfa_from_config(cfg)
    h, w = cfg.tpu.default_bucket
    fh, fw = h // 16, w // 16
    z = jnp.zeros((1, h, w, 3), jnp.float32)
    zmv = jnp.zeros((1, fh, fw, 2), jnp.float32)
    zres = jnp.zeros((1, fh, fw, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), z, z, z, jnp.ones((1,)),
                           jnp.ones((1,)), zmv, zres)
    det = StreamingDetector(model, variables, cfg, (h, w), batch=lanes)

    rnd = np.random.default_rng(0)
    frames = rnd.integers(0, 255, (lanes, h, w, 3), dtype=np.uint8)
    smalls = rnd.integers(0, 255, (lanes, h // 4, w // 4, 3), dtype=np.uint8)
    mvs = rnd.normal(0, 1.5, (lanes, fh, fw, 2)).astype(np.float16)
    ress = rnd.normal(0, 8, (lanes, fh, fw, 3)).astype(np.float16)
    im_info = np.tile(np.asarray([[600.0, 936.0, 1.6]], np.float32),
                      (lanes, 1))

    def run_gop(first):
        det.frame_id = 0
        d, v = det.process_frame(frames, im_info, flag=0 if first else 1)
        for _ in range(cfg.TEST.KEY_FRAME_INTERVAL - 1):
            d, v = det.process_frame(frames, im_info, mvs, ress, flag=2,
                                     small=smalls)
        jax.block_until_ready(d)

    det.reset()
    run_gop(True)   # compile
    best = 0.0
    for _ in range(3):
        det.reset()
        t0 = time.perf_counter()
        n_gops = 4
        for i in range(n_gops):
            run_gop(i == 0)
        dt = time.perf_counter() - t0
        best = max(best, lanes * n_gops * cfg.TEST.KEY_FRAME_INTERVAL / dt)
    print(f"multistream throughput: {best:.1f} frames/sec aggregate "
          f"({lanes} lanes, per-frame dispatch mode)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
