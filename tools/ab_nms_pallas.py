#!/usr/bin/env python
"""Interleaved A/B: XLA matvec-fixpoint NMS vs the fused Pallas kernel
inside the full proposal op, at production shapes.

Measures `rpn_proposals` end-to-end (decode + mask + top-k + NMS) on
realistic RPN score maps — the NMS formulation is the only difference
between arms, so the pairwise ratio isolates it. Trials alternate
(A,B,A,B,...) to cancel host drift (see tools/ab_interleaved.py).

Usage: python tools/ab_nms_pallas.py [--tier 2048] [--pairs 8] [--reps 30]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lsfa_tpu.utils.env import setup_cache

setup_cache()

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", type=int, default=2048)
    ap.add_argument("--pairs", type=int, default=8)
    ap.add_argument("--reps", type=int, default=30,
                    help="proposal calls per trial")
    args = ap.parse_args()

    from lsfa_tpu.config import get_default_config
    from lsfa_tpu.ops.anchors import anchor_grid
    from lsfa_tpu.ops.proposal import rpn_proposals

    cfg = get_default_config()
    h, w = cfg.tpu.default_bucket
    fh, fw = h // 16, w // 16
    na = len(cfg.network.ANCHOR_RATIOS) * len(cfg.network.ANCHOR_SCALES)
    anchors = jnp.asarray(anchor_grid(
        fh, fw, cfg.network.RPN_FEAT_STRIDE,
        tuple(cfg.network.ANCHOR_RATIOS), tuple(cfg.network.ANCHOR_SCALES)))
    rng = np.random.default_rng(0)
    # clustered scores -> realistic suppression density (not uniform noise)
    fg = jnp.asarray(rng.beta(0.5, 4.0, (fh, fw, na)).astype(np.float32))
    deltas = jnp.asarray(
        (rng.normal(0, 0.3, (fh, fw, na * 4))).astype(np.float32))
    im_info = jnp.asarray([h - 16.0, w - 32.0, 1.0], jnp.float32)

    def make(use_pallas):
        def run(fg, deltas):
            return rpn_proposals(
                fg, deltas, anchors, im_info,
                pre_nms_top_n=cfg.TEST.RPN_PRE_NMS_TOP_N,
                post_nms_top_n=cfg.TEST.RPN_POST_NMS_TOP_N,
                nms_thresh=cfg.TEST.RPN_NMS_THRESH,
                min_size=cfg.TEST.RPN_MIN_SIZE,
                feat_stride=cfg.network.RPN_FEAT_STRIDE,
                nms_tier=args.tier, use_pallas=use_pallas)
        return jax.jit(run)

    arm_a, arm_b = make(False), make(True)
    # parity first: identical keeps on the same input
    ra = jax.tree.map(np.asarray, arm_a(fg, deltas))
    rb = jax.tree.map(np.asarray, arm_b(fg, deltas))
    for x, y in zip(ra, rb):
        np.testing.assert_array_equal(x, y)
    print("parity: pallas == xla on production-shape input",
          file=sys.stderr, flush=True)

    def trial(fn):
        jax.block_until_ready(fn(fg, deltas))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(fg, deltas)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.reps * 1e3

    la, lb, ratios = [], [], []
    for k in range(args.pairs):
        ta = trial(arm_a)
        tb = trial(arm_b)
        la.append(ta)
        lb.append(tb)
        ratios.append(tb / ta)
        print(f"pair {k}: xla {ta:.3f} ms  pallas {tb:.3f} ms "
              f"ratio {tb / ta:.3f}", file=sys.stderr, flush=True)
    print(json.dumps({
        "metric": "proposal_nms_pallas_over_xla",
        "tier": args.tier,
        "xla_ms": sorted(la)[len(la) // 2],
        "pallas_ms": sorted(lb)[len(lb) // 2],
        "ratio_median": sorted(ratios)[len(ratios) // 2],
        "ratio_min": min(ratios), "ratio_max": max(ratios),
    }))


if __name__ == "__main__":
    main()
