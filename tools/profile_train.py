#!/usr/bin/env python
"""Attribute the train step's time (VERDICT r4 item 5).

The flagship train step ran 523 ms at batch 1 (2.2% MFU, 32% of modeled
HBM) — roughly two-thirds of the step is neither compute nor bytes by
the roofline. This tool splits the step into its phases ON DEVICE and
separates dispatch pipelining from compute:

  fwd            model.forward_train alone
  fwd+loss       + detection_losses (anchor assign, proposals, psroi)
  grad           value_and_grad of the full loss (no optimizer)
  full step      the production train_step (grad + optax + donation)
  chained steps  N steps back-to-back with donated carries — the
                 per-step time the training loop actually pays; the
                 difference vs `full step` (block each step) is the
                 dispatch/transfer overlap the loop already hides.

Optionally writes an xplane trace (--trace DIR) for op-level analysis.

Usage: python tools/profile_train.py [--batch 1] [--steps 8] [--trace DIR]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lsfa_tpu.utils.env import setup_cache

setup_cache()

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--trace", default=None,
                    help="write an xplane trace of 3 chained steps here")
    ap.add_argument("--height", type=int, default=608)
    ap.add_argument("--width", type=int, default=1024)
    args = ap.parse_args()

    import optax

    from lsfa_tpu.config import get_default_config
    from lsfa_tpu.models.lsfa import lsfa_from_config
    from lsfa_tpu.train.train_step import (TrainSettings, detection_losses,
                                           make_train_step)
    from lsfa_tpu.ops.anchors import anchor_grid

    cfg = get_default_config()
    model = lsfa_from_config(cfg)
    b, h, w = args.batch, args.height, args.width
    fh, fw = h // 16, w // 16
    rng = jax.random.PRNGKey(0)
    z = jnp.zeros((1, h, w, 3), jnp.float32)
    zmv = jnp.zeros((1, fh, fw, 2), jnp.float32)
    zres = jnp.zeros((1, fh, fw, 3), jnp.float32)
    variables = model.init(rng, z, z, z, jnp.ones((1,)), jnp.ones((1,)),
                           zmv, zres)
    params, batch_stats = variables["params"], variables["batch_stats"]
    settings = TrainSettings.from_config(cfg)
    opt = optax.sgd(1e-3, momentum=0.9)
    opt_state = opt.init(params)

    rnd = np.random.default_rng(0)
    from lsfa_tpu.data.loader import payload_dtype
    dt = payload_dtype(cfg)
    batch = {
        "data": rnd.integers(0, 255, (b, h, w, 3)).astype(np.uint8),
        "data_ref": rnd.integers(0, 255, (b, h, w, 3)).astype(np.uint8),
        "data_ref_old": rnd.integers(0, 255, (b, h, w, 3)).astype(np.uint8),
        "eq_flag": np.zeros((b,), np.float32),
        "eq_flag_old": np.zeros((b,), np.float32),
        "motion_vector": rnd.normal(0, 1.5, (b, fh, fw, 2)).astype(dt),
        "res_diff": rnd.normal(0, 8, (b, fh, fw, 3)).astype(dt),
        "im_info": np.tile(np.asarray([[600.0, 1000.0, 1.04]], np.float32),
                           (b, 1)),
        "gt_boxes": np.concatenate([
            rnd.uniform(10, 300, (b, 100, 2)),
            rnd.uniform(320, 560, (b, 100, 2)),
            rnd.integers(1, 30, (b, 100, 1)).astype(np.float64)],
            axis=2).astype(np.float32),
        "gt_valid": np.tile((np.arange(100) < 5)[None], (b, 1)),
    }
    batch = {k: jax.device_put(v) for k, v in batch.items()}
    key = jax.random.PRNGKey(7)
    anchors = jnp.asarray(anchor_grid(fh, fw, settings.feat_stride,
                                      settings.anchor_ratios,
                                      settings.anchor_scales))

    @jax.jit
    def fwd_only(params, batch_stats, batch):
        out, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["data"], batch["data_ref"], batch["data_ref_old"],
            batch["eq_flag"], batch["eq_flag_old"],
            batch["motion_vector"], batch["res_diff"],
            method=model.forward_train, mutable=["batch_stats"])
        # reduce to one scalar: every output map must be materialized
        # (the r5 first run read 0.9 ms for the dict-returning variant —
        # not a believable 3-backbone forward; defeat any elision)
        return sum(jnp.sum(v.astype(jnp.float32)) for v in out.values()
                   if hasattr(v, "dtype"))

    @jax.jit
    def fwd_loss(params, batch_stats, batch, key):
        out, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["data"], batch["data_ref"], batch["data_ref_old"],
            batch["eq_flag"], batch["eq_flag_old"],
            batch["motion_vector"], batch["res_diff"],
            method=model.forward_train, mutable=["batch_stats"])
        total, metrics = detection_losses(out, batch, anchors, key, settings)
        return total

    @jax.jit
    def grad_only(params, batch_stats, batch, key):
        def loss_fn(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": batch_stats},
                batch["data"], batch["data_ref"], batch["data_ref_old"],
                batch["eq_flag"], batch["eq_flag_old"],
                batch["motion_vector"], batch["res_diff"],
                method=model.forward_train, mutable=["batch_stats"])
            total, _ = detection_losses(out, batch, anchors, key, settings)
            return total
        return jax.value_and_grad(loss_fn)(params)

    step = make_train_step(model, settings, optimizer=opt)

    print(f"shapes: batch={b} {h}x{w} (grid {fh}x{fw})", flush=True)
    t_fwd = timeit(fwd_only, params, batch_stats, batch)
    print(f"forward_train only         : {t_fwd:7.1f} ms", flush=True)
    t_fl = timeit(fwd_loss, params, batch_stats, batch, key)
    print(f"forward + detection losses : {t_fl:7.1f} ms "
          f"(loss path {t_fl - t_fwd:+.1f})", flush=True)
    t_gr = timeit(grad_only, params, batch_stats, batch, key)
    print(f"value_and_grad             : {t_gr:7.1f} ms "
          f"(backward {t_gr - t_fl:+.1f})", flush=True)

    # full step, blocking each dispatch (upper bound incl. dispatch)
    def run_full(params, batch_stats, opt_state):
        return step(params, batch_stats, opt_state, batch, key)

    p2, bs2, os2, m = run_full(params, batch_stats, opt_state)
    jax.block_until_ready(m["total_loss"])
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        p2, bs2, os2, m = step(p2, bs2, os2, batch, key)
        jax.block_until_ready(m["total_loss"])
    t_full = (time.perf_counter() - t0) / n * 1e3
    print(f"full step (block each)     : {t_full:7.1f} ms "
          f"(optimizer+misc {t_full - t_gr:+.1f})", flush=True)

    # chained: what the loop pays with donation + async dispatch
    t0 = time.perf_counter()
    for _ in range(args.steps):
        p2, bs2, os2, m = step(p2, bs2, os2, batch, key)
    jax.block_until_ready(m["total_loss"])
    t_chain = (time.perf_counter() - t0) / args.steps * 1e3
    print(f"chained steps (x{args.steps})        : {t_chain:7.1f} ms/step "
          f"({b / (t_chain / 1e3):.2f} im/s)", flush=True)

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                p2, bs2, os2, m = step(p2, bs2, os2, batch, key)
            jax.block_until_ready(m["total_loss"])
        print(f"xplane trace written to {args.trace}", flush=True)


if __name__ == "__main__":
    main()
