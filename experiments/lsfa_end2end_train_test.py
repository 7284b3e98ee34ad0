#!/usr/bin/env python
"""Train + test launcher (the experiments/dff_rfcn/*_train_test.py role).

Usage: python experiments/lsfa_end2end_train_test.py --cfg configs/lsfa_resnet101_vid.yaml
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lsfa_tpu.utils.env import setup_cache

setup_cache()  # honor JAX_PLATFORMS + persistent compile cache (utils/env.py)


def main():
    ap = argparse.ArgumentParser(description="LSFA-TPU end-to-end train+test")
    ap.add_argument("--cfg", required=True, help="experiment yaml")
    ap.add_argument("--frequent", type=int, default=None, help="log interval")
    ap.add_argument("--max-steps", type=int, default=None,
                    help="stop training early (smoke runs)")
    ap.add_argument("--skip-test", action="store_true")
    args = ap.parse_args()

    from lsfa_tpu.config import load_config
    from lsfa_tpu.train.driver import train_net

    cfg = load_config(args.cfg)
    if args.frequent is not None:
        cfg.default.frequent = args.frequent
    params, batch_stats = train_net(cfg, max_steps=args.max_steps)
    if args.skip_test:
        return
    from experiments.lsfa_test import run_test
    run_test(cfg, params=params, batch_stats=batch_stats)


if __name__ == "__main__":
    main()
