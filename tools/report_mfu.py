#!/usr/bin/env python
"""Achieved-vs-peak FLOP and HBM-bandwidth accounting (MFU) for the LSFA
programs (VERDICT r3 item 3: the perf story was FPS-only).

For each production program — key-frame step, batched non-key (cur) step,
the G-GOP scan window (the e2e inference program), and the train step —
this compiles the exact jitted callable the runtime uses, reads XLA's
cost analysis (flops + bytes accessed), times the compiled executable,
and reports achieved TFLOP/s, MFU vs the device's peak, HBM GB/s vs peak,
and the roofline verdict (MXU-bound vs memory-bound: arithmetic intensity
vs the device ridge point).

Caveats: XLA's `cost_analysis()` flops are the compiler's own estimate
post-fusion (rematerialized/duplicated work counts; convs count as
2*MACs); "bytes accessed" models HBM traffic assuming perfect on-chip
reuse within a fusion. Both are the standard first-order roofline inputs,
not hardware counters.

Usage: python tools/report_mfu.py [--out runs/MFU_r04.json] [--gops 2]
       [--trials 20] [--tiny] [--skip-train]
Reference throughput answer this extends: dff_rfcn/function/test_rcnn.py
:69-75 (frames/s only).
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

# peak (dense bf16 matmul TFLOP/s, HBM GB/s) by PJRT device kind; override
# with LSFA_PEAK_TFLOPS / LSFA_PEAK_GBPS for kinds not listed
PEAKS = {
    "TPU v5 lite": (197e12, 819e9),      # v5e
    "TPU v5e": (197e12, 819e9),
    "TPU v4": (275e12, 1228e9),
    "TPU v6 lite": (918e12, 1640e9),     # v6e / Trillium
}


def device_peaks():
    import jax
    kind = jax.devices()[0].device_kind
    tf = os.environ.get("LSFA_PEAK_TFLOPS")
    gb = os.environ.get("LSFA_PEAK_GBPS")
    if tf and gb:
        return kind, float(tf) * 1e12, float(gb) * 1e9
    for k, (f, b) in PEAKS.items():
        if k.lower() in kind.lower():
            return kind, f, b
    # unknown device (e.g. CPU smoke): report absolute numbers only
    return kind, None, None


def cost_of(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return (float(ca.get("flops", 0.0)),
            float(ca.get("bytes accessed", 0.0)))


def time_compiled(run, trials):
    import jax
    jax.block_until_ready(run())          # warm
    t0 = time.perf_counter()
    for _ in range(trials):
        out = run()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / trials


def entry(name, flops, bytes_, sec, peak_f, peak_b, frames=None):
    tflops = flops / sec / 1e12
    gbps = bytes_ / sec / 1e9
    ai = flops / bytes_ if bytes_ else float("inf")
    row = {
        "ms": round(sec * 1e3, 3),
        "gflop": round(flops / 1e9, 2),
        "hbm_gb": round(bytes_ / 1e9, 3),
        "achieved_tflops": round(tflops, 2),
        "achieved_hbm_gbps": round(gbps, 1),
        "arith_intensity_flop_per_byte": round(ai, 1),
    }
    if frames:
        row["ms_per_frame"] = round(sec * 1e3 / frames, 3)
    if peak_f:
        ridge = peak_f / peak_b
        row["mfu_pct"] = round(100 * tflops * 1e12 / peak_f, 1)
        row["hbm_util_pct"] = round(100 * gbps * 1e9 / peak_b, 1)
        row["roofline"] = ("MXU-bound (ai >= ridge)"
                           if ai >= ridge else "memory-bound (ai < ridge)")
    print(f"{name:>18}: {row['ms']:8.2f} ms  {row['gflop']:9.1f} GFLOP  "
          f"{row['achieved_tflops']:6.2f} TF/s"
          + (f"  MFU {row['mfu_pct']:5.1f}%  HBM {row['hbm_util_pct']:5.1f}%"
             f"  [{row['roofline']}]" if peak_f else ""),
          flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--gops", type=int, default=2)
    ap.add_argument("--trials", type=int, default=20)
    ap.add_argument("--tiny", action="store_true",
                    help="resnet18/64ch tiny config (CPU smoke)")
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _build_detector
    from lsfa_tpu.data.loader import payload_dtype

    kind, peak_f, peak_b = device_peaks()
    print(f"device: {kind}  peak {peak_f and peak_f / 1e12} TF/s, "
          f"{peak_b and peak_b / 1e9} GB/s", flush=True)

    if args.tiny:
        from lsfa_tpu.config import get_default_config
        from lsfa_tpu.eval.tester import StreamingDetector
        from lsfa_tpu.models.lsfa import lsfa_from_config
        cfg = get_default_config()
        cfg.network.num_layer = 18
        cfg.network.DFF_FEAT_DIM = 64
        cfg.network.add_dcn = False
        cfg.tpu.compute_dtype = "float32"
        cfg.tpu.default_bucket = (64, 96)
        cfg.TEST.RPN_PRE_NMS_TOP_N = 128
        cfg.TEST.RPN_POST_NMS_TOP_N = 32
        model = lsfa_from_config(cfg)
        th, tw = cfg.tpu.default_bucket
        z = jnp.zeros((1, th, tw, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), z, z, z,
                               jnp.ones((1,)), jnp.ones((1,)),
                               jnp.zeros((1, th // 16, tw // 16, 2)),
                               jnp.zeros((1, th // 16, tw // 16, 3)))
        det = StreamingDetector(model, variables, cfg, (th, tw), batch=1)
    else:
        cfg, det = _build_detector(batch=1, flags=[])

    dt = payload_dtype(cfg)
    h, w = cfg.tpu.default_bucket
    fh, fw = h // 16, w // 16
    interval = cfg.TEST.KEY_FRAME_INTERVAL
    n = interval - 1
    G = args.gops
    rnd = np.random.default_rng(0)
    report = {"device": kind,
              "peak_tflops": peak_f and peak_f / 1e12,
              "peak_hbm_gbps": peak_b and peak_b / 1e9,
              "bucket": [h, w], "gops_per_window": G,
              "key_interval": interval, "programs": {}}

    # ---- inference programs (the exact jitted callables the detector
    # dispatches) ----
    det.reset()
    key = jnp.asarray(rnd.integers(0, 255, (1, h, w, 3), dtype=np.uint8))
    smalls1 = jnp.asarray(
        rnd.integers(0, 255, (n, h // 4, w // 4, 3), dtype=np.uint8))
    mv1 = jnp.asarray(rnd.normal(0, 1, (n, fh, fw, 2)).astype(dt))
    res1 = jnp.asarray(rnd.normal(0, 8, (n, fh, fw, 3)).astype(dt))
    im_info = jnp.asarray([[600.0, float(w), 1.0]], jnp.float32)
    is_first = jnp.ones((1,), jnp.float32)

    ks = det._key_step.lower(det.variables, key, det.data_key, det.feat_key,
                             is_first, im_info).compile()
    f, b = cost_of(ks)
    sec = time_compiled(lambda: ks(det.variables, key, det.data_key,
                                   det.feat_key, is_first, im_info),
                        args.trials)
    report["programs"]["key_step"] = entry("key_step", f, b, sec,
                                           peak_f, peak_b, frames=1)

    feat_key = ks(det.variables, key, det.data_key, det.feat_key, is_first,
                  im_info)[0]
    cb = det._cur_batch_step.lower(det.variables, smalls1, feat_key, mv1,
                                   res1, im_info).compile()
    f, b = cost_of(cb)
    sec = time_compiled(lambda: cb(det.variables, smalls1, feat_key, mv1,
                                   res1, im_info), args.trials)
    report["programs"]["cur_batch_step"] = entry(
        f"cur_batch x{n}", f, b, sec, peak_f, peak_b, frames=n)

    keys = jnp.asarray(rnd.integers(0, 255, (G, 1, h, w, 3), dtype=np.uint8))
    smalls = jnp.asarray(rnd.integers(
        0, 255, (G, n, h // 4, w // 4, 3), dtype=np.uint8))
    mvs = jnp.asarray(rnd.normal(0, 1, (G, n, fh, fw, 2)).astype(dt))
    ress = jnp.asarray(rnd.normal(0, 8, (G, n, fh, fw, 3)).astype(dt))
    is_firsts = jnp.zeros((G, 1), jnp.float32)
    sc = det._scan_gops_step.lower(
        det.variables, det.feat_key, det.data_key, keys, is_firsts, smalls,
        mvs, ress, im_info).compile()
    f, b = cost_of(sc)
    sec = time_compiled(lambda: sc(det.variables, det.feat_key, det.data_key,
                                   keys, is_firsts, smalls, mvs, ress,
                                   im_info), args.trials)
    row = entry(f"scan_window G={G}", f, b, sec, peak_f, peak_b,
                frames=G * interval)
    row["device_fps"] = round(G * interval / sec, 1)
    report["programs"]["scan_window"] = row

    # ---- train step ----
    if not args.skip_train:
        from lsfa_tpu.models.lsfa import lsfa_from_config
        from lsfa_tpu.train.schedule import make_optimizer
        from lsfa_tpu.train.train_step import TrainSettings, make_train_step

        model = lsfa_from_config(cfg)
        bt = 1
        z = jnp.zeros((bt, h, w, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), z, z, z,
                               jnp.ones((bt,)), jnp.ones((bt,)),
                               jnp.zeros((bt, fh, fw, 2)),
                               jnp.zeros((bt, fh, fw, 3)))
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        settings = TrainSettings.from_config(cfg)
        optimizer = make_optimizer(params, base_lr=1e-5, lr_steps=[10000])
        opt_state = optimizer.init(params)
        step = make_train_step(model, settings, None, optimizer)
        gt = np.zeros((bt, 8, 5), np.float32)
        gt[:, 0] = [10.0, 10.0, 120.0, 120.0, 1.0]
        gtv = np.zeros((bt, 8), bool)
        gtv[:, 0] = True
        batch = {
            "data": rnd.integers(0, 255, (bt, h, w, 3)).astype(np.float32),
            "data_ref": rnd.integers(0, 255, (bt, h, w, 3)).astype(np.float32),
            "data_ref_old": rnd.integers(0, 255,
                                         (bt, h, w, 3)).astype(np.float32),
            "eq_flag": np.zeros((bt,), np.float32),
            "eq_flag_old": np.zeros((bt,), np.float32),
            "motion_vector": rnd.normal(0, 1, (bt, fh, fw, 2)).astype(dt),
            "res_diff": rnd.normal(0, 8, (bt, fh, fw, 3)).astype(dt),
            "gt_boxes": gt, "gt_valid": gtv,
            "im_info": np.tile(np.asarray([[h, w, 1.0]], np.float32),
                               (bt, 1)),
        }
        lowered = step.lower(params, batch_stats, opt_state, batch,
                             jax.random.PRNGKey(1)).compile()
        f, b = cost_of(lowered)
        # donated buffers: time by CHAINING state through steps (the real
        # training pattern), not by re-calling on stale donated args
        p, bs, os_ = params, batch_stats, opt_state
        p, bs, os_, m = step(p, bs, os_, batch, jax.random.PRNGKey(2))
        jax.block_until_ready(m["total_loss"])
        t0 = time.perf_counter()
        ktr = max(5, args.trials // 2)
        for i in range(ktr):
            p, bs, os_, m = step(p, bs, os_, batch, jax.random.PRNGKey(i))
        jax.block_until_ready(m["total_loss"])
        sec = (time.perf_counter() - t0) / ktr
        row = entry(f"train_step b{bt}", f, b, sec, peak_f, peak_b)
        row["steps_per_s"] = round(1.0 / sec, 3)
        report["programs"]["train_step"] = row

    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as fo:
            json.dump(report, fo, indent=1)
        print(f"wrote {args.out}")
    print(json.dumps({k: v.get("mfu_pct") for k, v in
                      report["programs"].items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
