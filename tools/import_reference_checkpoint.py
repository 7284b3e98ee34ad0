"""Convert a reference MXNet checkpoint into an lsfa_tpu orbax checkpoint.

Usage:
  python tools/import_reference_checkpoint.py --cfg configs/lsfa_resnet101_vid.yaml \
      --params /path/to/lsfa-0002.params [--flownet /path/to/flownet-0000.params] \
      --out /path/to/ckpt_dir [--strict backbone,flownet]

Reads the reference's flat arg:/aux: NDArray dict(s)
(lib/utils/save_model.py:11-25), maps every tensor onto the flax tree
(train/import_mxnet.py), seeds the small net from the backbone
(init_weight, resnet_v1_101_flownet_rfcn.py:753-760), and writes epoch-0
orbax state ready for eval or resume. Reminder: weights trained by the
reference expect network.res_diff_legacy_swap=True at data-loading time
(the reference's residual channel-transform bug, lib/utils/image.py:217-218).
"""

from __future__ import annotations

import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--params", required=True, help=".params checkpoint")
    ap.add_argument("--flownet", default=None,
                    help="optional separate FlowNet .params (combine_model)")
    ap.add_argument("--out", required=True, help="orbax checkpoint dir")
    ap.add_argument("--strict", default="",
                    help="comma list of modules that must import fully")
    args = ap.parse_args()

    from lsfa_tpu.config import load_config
    from lsfa_tpu.models.lsfa import lsfa_from_config
    from lsfa_tpu.train.checkpoint import save_checkpoint, seed_small_net
    from lsfa_tpu.train.import_mxnet import import_mxnet_lsfa
    from lsfa_tpu.train.schedule import make_optimizer

    import jax
    import jax.numpy as jnp

    cfg = load_config(args.cfg)
    model = lsfa_from_config(cfg)
    h, w = cfg.tpu.default_bucket
    fh, fw = h // 16, w // 16
    data = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), data, data, data,
                           jnp.ones((1,)), jnp.ones((1,)),
                           jnp.zeros((1, fh, fw, 2)),
                           jnp.zeros((1, fh, fw, 3)))
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}

    strict = tuple(m for m in args.strict.split(",") if m)
    for path in [args.params] + ([args.flownet] if args.flownet else []):
        variables, report = import_mxnet_lsfa(
            variables, path,
            bbox_means=tuple(cfg.TRAIN.BBOX_MEANS),
            bbox_stds=tuple(cfg.TRAIN.BBOX_STDS),
            strict_modules=strict)
        print(f"{path}: imported {len(report['imported'])} tensors, "
              f"{len(report['missing'])} flax leaves unmatched, "
              f"{len(report['unused'])} checkpoint tensors unused")
        for m in report["missing"][:20]:
            print("  missing:", m)
        if report["unused"]:
            for u in report["unused"][:20]:
                print("  unused: ", u)

    params = seed_small_net(variables["params"])
    optimizer = make_optimizer(params, base_lr=cfg.TRAIN.lr, lr_steps=[1])
    save_checkpoint(args.out, 0, params, variables["batch_stats"],
                    optimizer.init(params))
    print(f"wrote orbax checkpoint to {args.out} (epoch 0)")
    if not bool(getattr(cfg.network, "res_diff_legacy_swap", False)):
        print("NOTE: set network.res_diff_legacy_swap: true in the config "
              "when evaluating reference-trained weights", file=sys.stderr)


if __name__ == "__main__":
    main()
