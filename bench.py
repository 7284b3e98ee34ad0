"""End-to-end LSFA inference benchmark on the current JAX default device.

Measures the production streaming loop — 1 key frame (full ResNet-101 +
FlowNet + Nq aggregation) + (KEY_FRAME_INTERVAL-1) non-key frames (MV warp
+ R-net + small net) with full detection post-processing (proposals,
PSROIPooling, per-class NMS) — at the 608x960 bucket, and reports
frames/sec against the reference's 30 FPS Titan X headline
(figs/results.png; README.md:8).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lsfa_tpu.config import get_default_config
    from lsfa_tpu.eval.tester import StreamingDetector
    from lsfa_tpu.models.lsfa import lsfa_from_config

    cfg = get_default_config()
    model = lsfa_from_config(cfg)
    h, w = cfg.tpu.default_bucket
    fh, fw = h // 16, w // 16

    rng = jax.random.PRNGKey(0)
    zdata = jnp.zeros((1, h, w, 3), jnp.float32)
    zmv = jnp.zeros((1, fh, fw, 2), jnp.float32)
    zres = jnp.zeros((1, fh, fw, 3), jnp.float32)
    variables = model.init(rng, zdata, zdata, zdata, jnp.ones((1,)),
                           jnp.ones((1,)), zmv, zres)

    det = StreamingDetector(model, variables, cfg, (h, w))

    rnd = np.random.default_rng(0)
    frame = rnd.normal(0, 60, size=(1, h, w, 3)).astype(np.float32)
    im_info = np.asarray([[600.0, 936.0, 1.6]], np.float32)
    mv = rnd.normal(0, 1.5, size=(1, fh, fw, 2)).astype(np.float32)
    res = rnd.normal(0, 8, size=(1, fh, fw, 3)).astype(np.float32)

    interval = cfg.TEST.KEY_FRAME_INTERVAL

    def run_gop():
        outs = []
        det.frame_id = 0
        d, v = det.process_frame(frame, im_info, flag=0)
        outs.append(d)
        for _ in range(interval - 1):
            d, v = det.process_frame(frame, im_info, mv, res, flag=2)
            outs.append(d)
        jax.block_until_ready(outs[-1])
        return outs

    # warmup (compile both paths)
    det.reset()
    run_gop()

    n_gops = 8
    det.reset()
    t0 = time.perf_counter()
    for _ in range(n_gops):
        run_gop()
    dt = time.perf_counter() - t0
    fps = n_gops * interval / dt

    print(json.dumps({
        "metric": "lsfa_e2e_inference_fps",
        "value": round(fps, 2),
        "unit": "frames/sec (608x960, ResNet-101+DCN LSFA, key interval 12)",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
