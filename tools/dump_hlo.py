#!/usr/bin/env python
"""Dump the optimized HLO of the production GOP-scan program and rank its
layout-change ops (transpose/copy/bitcast-convert) by byte volume.

The xplane traces that guided the round-3 device ladder are not
committed; this gives a reproducible, trace-free way to find structural
HBM costs (e.g. XLA-inserted layout transposes) in the compiled window.

Usage: python tools/dump_hlo.py [--out /tmp/scan.hlo] [--top 20]
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lsfa_tpu.utils.env import setup_cache

setup_cache()

import numpy as np


DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
               "s8": 1, "u8": 1, "pred": 1, "s16": 2, "u16": 2, "f64": 8}


def shape_bytes(shape_str):
    """'f32[12,304,512,6]{3,2,1,0}' -> bytes. Tuple-shaped results
    ('(f32[...], s32[...])' — fusion/copy ops with multiple outputs) sum
    their leaf shapes instead of ranking as 0 bytes."""
    if shape_str.lstrip().startswith("("):
        return sum(shape_bytes(m.group(0)) for m in
                   re.finditer(r"\w+\[[\d,]*\]", shape_str))
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES.get(dt, 4)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/scan.hlo")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--ops", default="transpose,copy",
                    help="comma list of HLO opcodes to rank")
    args = ap.parse_args()

    import jax
    import bench

    arm = bench.E2EArm(flags=[])
    det = arm.det
    win = [arm.pv.gop(0)] * arm.G
    kf = np.stack([w_[0][0:1] for w_ in win])
    sm = np.stack([w_[1][1:] for w_ in win])
    mv = np.stack([w_[2][1:] for w_ in win]).astype(arm.dt)
    rs = np.stack([w_[3][1:] for w_ in win]).astype(arm.dt)
    info = win[0][4][None]
    det.reset()
    import jax.numpy as jnp
    g = kf.shape[0]
    is_firsts = jnp.zeros((g, det.batch), jnp.float32)
    lowered = det._scan_gops_step.lower(
        det.variables, det.feat_key, det.data_key, jnp.asarray(kf),
        is_firsts, jnp.asarray(sm), jnp.asarray(mv), jnp.asarray(rs),
        jnp.asarray(info))
    txt = lowered.compile().as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} chars to {args.out}", file=sys.stderr)

    opcodes = tuple(args.ops.split(","))
    rows = []
    for line in txt.splitlines():
        ls = line.strip()
        m = re.match(r"(\S+)\s*=\s*(\S+?)\s+(\w+)\(", ls)
        if not m:
            continue
        name, shape, op = m.groups()
        if op in opcodes:
            rows.append((shape_bytes(shape), op, name, shape, ls[:160]))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"{len(rows)} {opcodes} ops, {total / 1e6:.1f} MB total output")
    for b, op, name, shape, line in rows[: args.top]:
        print(f"{b / 1e6:9.2f} MB  {op:10s} {shape:36s} {line}")


if __name__ == "__main__":
    main()
