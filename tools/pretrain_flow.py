#!/usr/bin/env python
"""Self-supervised photometric pretraining of FlowNet-S on synthetic VID.

The reference recipe never trains FlowNet from scratch: combine_model
merges a FlyingChairs-pretrained FlowNet .params into the detection
checkpoint before end-to-end training (dff_rfcn/train_end2end.py:111-115).
This environment has no such checkpoint, so this tool produces the in-env
stand-in: FlowNet-S trained with a photometric warp loss on frame pairs
from the synthetic compressed videos —

    L = |flow_warp(pool16(old), flow) - pool16(cur)|_1  + lam_tv * TV(flow)

where pool16 downsamples the normalized image to the stride-16 feature
grid the flow is applied on (models/lsfa.py:199-201). Pairs are sampled
at GOP-scale offsets (1..12 frames) to match the long-term key->key use.
The scale-map head keeps its constant-1 init (zero weight / one bias,
reference :869-870) — photometric data carries no signal for it.

Output: an orbax checkpoint whose params tree is {"flownet": ...},
consumed by cfg.network.pretrained_flow (train/driver.py init_model) or
tools/train_synth_full.py --init-flow.

Usage:
  python tools/pretrain_flow.py [--steps 1500] [--out /tmp/lsfa_flow_ckpt]
      [--data /tmp/lsfa_synth_data] [--cpu-smoke]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--lam-tv", type=float, default=0.01)
    ap.add_argument("--out", default="/tmp/lsfa_flow_ckpt")
    ap.add_argument("--data", default="/tmp/lsfa_synth_data")
    ap.add_argument("--videos", type=int, default=30)
    ap.add_argument("--frames", type=int, default=72)
    ap.add_argument("--profile", default="hard", choices=["easy", "hard"])
    ap.add_argument("--feat-dim", type=int, default=1024)
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--cpu-smoke", action="store_true",
                    help="tiny shapes on CPU (CI smoke of this tool)")
    args = ap.parse_args()

    import jax

    if args.cpu_smoke:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import optax

    from lsfa_tpu.data import coviar
    from lsfa_tpu.data.synth import make_synth_vid_dataset
    from lsfa_tpu.models.flownet import FlowNetS
    from lsfa_tpu.ops.warp import flow_warp
    from lsfa_tpu.train.checkpoint import save_checkpoint

    if args.cpu_smoke:
        sizes = ((128, 96),)
        args.videos, args.frames = 2, 24
        args.batch = 2
        args.feat_dim = 32
    else:
        sizes = ((960, 576), (576, 960))

    roidb, _, _ = make_synth_vid_dataset(
        args.data, n_videos=args.videos, n_frames=args.frames, seed=0,
        sizes=sizes, split="train", profile=args.profile)
    videos = sorted({r["video_path"] for r in roidb})
    # group by frame orientation: one jitted program per static shape
    by_shape = {}
    for v in videos:
        rec = next(r for r in roidb if r["video_path"] == v)
        by_shape.setdefault((rec["height"], rec["width"]), []).append(v)

    model = FlowNetS(feat_dim=args.feat_dim)
    rng = jax.random.PRNGKey(0)
    h0, w0 = next(iter(by_shape))
    dummy = jnp.zeros((1, h0, w0, 3), jnp.float32)
    params = model.init(rng, dummy, dummy)["params"]
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    def pool16(x):
        b, h, w, c = x.shape
        return x.reshape(b, h // 16, 16, w // 16, 16, c).mean(axis=(2, 4))

    def loss_fn(p, cur, old):
        flow, _ = model.apply({"params": p}, cur, old)
        cur_s, old_s = pool16(cur), pool16(old)
        warped = flow_warp(old_s, flow)
        photo = jnp.abs(warped - cur_s).mean()
        tv = (jnp.abs(jnp.diff(flow, axis=1)).mean()
              + jnp.abs(jnp.diff(flow, axis=2)).mean())
        return photo + args.lam_tv * tv, photo

    @jax.jit
    def train_step(p, o, cur, old):
        (loss, photo), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, cur, old)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss, photo

    def batch_for(shape_vids, rng_np, h, w):
        cur = np.empty((args.batch, h, w, 3), np.float32)
        old = np.empty((args.batch, h, w, 3), np.float32)
        for i in range(args.batch):
            v = shape_vids[rng_np.integers(len(shape_vids))]
            n = coviar.get_num_frames(v)
            cur_id = int(rng_np.integers(1, n))
            off = int(rng_np.integers(1, 13))
            old_id = max(cur_id - off, 0)
            for j, fid in ((0, cur_id), (1, old_id)):
                im = coviar.load(v, fid // 12, fid % 12, 0)
                # BGR -> RGB, resnet pixel stats (means 0, scale 1) — the
                # exact tensor LSFA.preprocess feeds the flownet
                (cur if j == 0 else old)[i] = im[..., ::-1]
        return cur, old

    rng_np = np.random.default_rng(0)
    shapes = list(by_shape)
    t0 = time.perf_counter()
    photo0 = photo_last = None
    for step in range(args.steps):
        h, w = shapes[step % len(shapes)]
        cur, old = batch_for(by_shape[(h, w)], rng_np, h, w)
        params, opt_state, loss, photo = train_step(params, opt_state,
                                                    cur, old)
        if step % args.log_every == 0 or step == args.steps - 1:
            loss, photo = float(loss), float(photo)
            if photo0 is None:
                photo0 = photo
            photo_last = photo
            dt = time.perf_counter() - t0
            print(f"step {step}: loss {loss:.4f} photo {photo:.4f} "
                  f"({dt:.0f}s)", flush=True)

    save_checkpoint(args.out, args.steps, {"flownet": params}, {}, {})
    report = {
        "steps": args.steps,
        "photo_first": round(photo0, 4),
        "photo_final": round(photo_last, 4),
        "wall_s": round(time.perf_counter() - t0, 1),
        "out": args.out,
    }
    print(json.dumps(report))
    with open(os.path.join(args.out, "flow_pretrain.json"), "w") as f:
        json.dump(report, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
