#!/usr/bin/env python
"""Interleaved A/B end-to-end benchmark (drift-robust comparisons).

The axon-tunneled host drifts +/-30% across hours (ROADMAP.md), so two
sequential `bench.py` runs cannot be compared trustworthily: a 15% win
is within drift. This runs TWO configurations in ALTERNATING trials
(A,B,A,B,...) inside one process. Drift is slow relative to a trial
(~1 s), so adjacent trials see near-identical host conditions and the
per-pair B/A ratio is stable even when absolute FPS is not.

Usage:
  python tools/ab_interleaved.py --b "--bgr8"             # A = defaults
  python tools/ab_interleaved.py --a "--gops 2" --b "--gops 4" --pairs 6
  python tools/ab_interleaved.py --b "--sync" --clip /path/clip.mp4

--a/--b take bench.py flags (--sync, --overlap, --f32, --bgr8, --gops N).
Prints one JSON line: per-arm trial lists, per-pair ratios, and the
median B/A ratio with its min/max spread.
"""

import argparse
import json
import os
import shlex
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lsfa_tpu.utils.env import setup_cache

setup_cache()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", default="", help="bench.py flags for arm A "
                    "(default: bench defaults)")
    ap.add_argument("--b", required=True, help="bench.py flags for arm B")
    ap.add_argument("--pairs", type=int, default=5,
                    help="number of A/B trial pairs")
    ap.add_argument("--clip", default=None,
                    help="MPEG-4 clip (default: the synthetic bench clip)")
    args = ap.parse_args()

    import bench

    flags_a = shlex.split(args.a)
    flags_b = shlex.split(args.b)
    print(f"arm A: {flags_a or '(defaults)'}   arm B: {flags_b}",
          file=sys.stderr, flush=True)
    arm_a = bench.E2EArm(flags=flags_a, clip=args.clip)
    arm_b = bench.E2EArm(flags=flags_b, clip=args.clip)
    arm_a.warmup()
    arm_b.warmup()

    fps_a, fps_b, ratios = [], [], []
    for k in range(args.pairs):
        fa, ha, da = bench.e2e_trial(arm_a)
        fb, hb, db = bench.e2e_trial(arm_b)
        fps_a.append(fa)
        fps_b.append(fb)
        ratios.append(fb / fa)
        print(f"pair {k}: A {fa:.1f} FPS (decode {ha:.1f} dev {da:.1f}) | "
              f"B {fb:.1f} FPS (decode {hb:.1f} dev {db:.1f}) | "
              f"B/A {fb / fa:.3f}", file=sys.stderr, flush=True)

    out = {
        "metric": "ab_interleaved_fps_ratio",
        "arm_a": flags_a,
        "arm_b": flags_b,
        "fps_a": [round(f, 1) for f in fps_a],
        "fps_b": [round(f, 1) for f in fps_b],
        "median_fps_a": round(float(np.median(fps_a)), 2),
        "median_fps_b": round(float(np.median(fps_b)), 2),
        "pair_ratios": [round(r, 3) for r in ratios],
        "median_b_over_a": round(float(np.median(ratios)), 3),
        "ratio_spread": [round(min(ratios), 3), round(max(ratios), 3)],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
