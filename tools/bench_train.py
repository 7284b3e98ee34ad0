"""Train-step throughput on the current JAX default device.

Measures the full jitted LSFA train step (forward + backward + SGD update,
incl. on-device anchor assignment, proposals, ROI targets, OHEM) at the
flagship bucket, with synthetic host batches. Optional rematerialization
of the backbone (--remat) trades FLOPs for memory to admit larger
per-chip batches.

Usage: python tools/bench_train.py [--batch N] [--steps K] [--remat]
       [--tiny]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--remat", action="store_true")
    # warmup-scale lr: this bench runs the SAME noise batch every step
    # from random init (losses start ~200); the recipe lr (2.5e-4) without
    # the driver's warmup schedule diverges to nan within ~10 steps
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--tiny", action="store_true",
                    help="resnet18/64ch at 64x96 (CPU-friendly smoke)")
    args = ap.parse_args()

    from lsfa_tpu.utils.env import setup_cache

    setup_cache()
    import jax
    import jax.numpy as jnp

    from lsfa_tpu.config import get_default_config
    from lsfa_tpu.models.lsfa import lsfa_from_config
    from lsfa_tpu.train.schedule import make_optimizer
    from lsfa_tpu.train.train_step import TrainSettings, make_train_step

    cfg = get_default_config()
    if args.tiny:
        cfg.network.num_layer = 18
        cfg.network.DFF_FEAT_DIM = 64
        cfg.network.add_dcn = False
        cfg.tpu.compute_dtype = "float32"
        cfg.tpu.default_bucket = (64, 96)
        cfg.TRAIN.RPN_PRE_NMS_TOP_N = 128
        cfg.TRAIN.RPN_POST_NMS_TOP_N = 32
        cfg.TRAIN.BATCH_ROIS_OHEM = 16
    model = lsfa_from_config(cfg)
    if args.remat:
        # rematerialize the whole forward: activations recomputed in the
        # backward pass (jax.checkpoint), ~25-30% more FLOPs for a large
        # activation-memory cut
        import flax.linen as nn
        model = nn.remat(type(model))(**{f.name: getattr(model, f.name)
                                         for f in model.__dataclass_fields__.values()
                                         if f.name not in ("parent", "name")})

    b = args.batch
    h, w = cfg.tpu.default_bucket
    fh, fw = h // 16, w // 16
    rng = jax.random.PRNGKey(0)
    zeros = jnp.zeros((b, h, w, 3), jnp.float32)
    variables = model.init(rng, zeros, zeros, zeros, jnp.ones((b,)),
                           jnp.ones((b,)), jnp.zeros((b, fh, fw, 2)),
                           jnp.zeros((b, fh, fw, 3)))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    settings = TrainSettings.from_config(cfg)
    optimizer = make_optimizer(params, base_lr=args.lr, lr_steps=[10000])
    opt_state = optimizer.init(params)
    step = make_train_step(model, settings, None, optimizer)

    rnd = np.random.default_rng(0)
    gt = np.zeros((b, 8, 5), np.float32)
    gt[:, 0] = [10.0, 10.0, 120.0, 120.0, 1.0]
    gtv = np.zeros((b, 8), bool)
    gtv[:, 0] = True
    batch = {
        "data": rnd.integers(0, 255, (b, h, w, 3)).astype(np.float32),
        "data_ref": rnd.integers(0, 255, (b, h, w, 3)).astype(np.float32),
        "data_ref_old": rnd.integers(0, 255, (b, h, w, 3)).astype(np.float32),
        "eq_flag": np.zeros((b,), np.float32),
        "eq_flag_old": np.zeros((b,), np.float32),
        # f16 payloads (axon: f32 mv/res inputs fault the backend)
        "motion_vector": rnd.normal(0, 1, (b, fh, fw, 2)).astype(np.float16),
        "res_diff": rnd.normal(0, 8, (b, fh, fw, 3)).astype(np.float16),
        "gt_boxes": gt, "gt_valid": gtv,
        "im_info": np.tile(np.asarray([[h, w, 1.0]], np.float32), (b, 1)),
    }

    t0 = time.perf_counter()
    params, batch_stats, opt_state, m = step(params, batch_stats, opt_state,
                                             batch, jax.random.PRNGKey(1))
    jax.block_until_ready(m["total_loss"])
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s "
          f"loss={float(m['total_loss']):.3f}", flush=True)

    t0 = time.perf_counter()
    for i in range(args.steps):
        params, batch_stats, opt_state, m = step(
            params, batch_stats, opt_state, batch, jax.random.PRNGKey(i))
        jax.block_until_ready(m["total_loss"])
    dt = time.perf_counter() - t0
    sps = args.steps / dt
    print(f"{sps:.2f} steps/s  ({sps * b:.2f} images/s, batch {b}, "
          f"{h}x{w}, remat={args.remat}) "
          f"loss={float(m['total_loss']):.3f}")


if __name__ == "__main__":
    main()
