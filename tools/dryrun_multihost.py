#!/usr/bin/env python
"""Multi-host (multi-process) dryrun: prove initialize_distributed +
the global-mesh sharded train step execute across PROCESS boundaries,
not just across devices of one process (VERDICT round-2 item 5).

Spawns 2 local processes, each backing 4 virtual CPU devices
(xla_force_host_platform_device_count), joins them with
jax.distributed.initialize via lsfa_tpu.parallel.initialize_distributed,
builds the GLOBAL 8-device mesh, and runs one data-parallel LSFA train
step where each process contributes its local batch shard
(jax.make_array_from_process_local_data). The gradient all-reduce
therefore crosses the process boundary — the DCN analog of the
reference's never-configured kvstore 'dist_sync'
(dff_rfcn/core/module.py:476-477).

Parent mode verifies: both workers ran, losses finite and IDENTICAL
(same global computation), post-update parameter checksums IDENTICAL
(replicated params stayed in sync through the cross-process reduce).

Usage: python tools/dryrun_multihost.py [--out MULTIHOST.json]
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lsfa_tpu.utils.env import _host_tag  # noqa: E402

PORT = 12977
N_PROC = 2
DEV_PER_PROC = 4


def child(pid: int) -> int:
    import jax

    # the environment's TPU plugin force-registers itself over the
    # JAX_PLATFORMS env var — pin cpu explicitly (as tests/conftest.py
    # does) or both "hosts" silently attach to the one real chip
    jax.config.update("jax_platforms", "cpu")
    # multiprocess CPU needs a cross-process collectives backend; without
    # it each process builds an isolated single-process client and
    # jax.process_count() stays 1
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_num_cpu_devices", DEV_PER_PROC)
    import jax.numpy as jnp
    import numpy as np

    from lsfa_tpu.models.lsfa import LSFA
    from lsfa_tpu.parallel.mesh import (
        batch_sharding,
        initialize_distributed,
        replicate,
    )
    from lsfa_tpu.train.schedule import make_optimizer
    from lsfa_tpu.train.train_step import TrainSettings, make_train_step
    from lsfa_tpu.config import get_default_config

    mesh = initialize_distributed(f"localhost:{PORT}", N_PROC, pid)
    assert jax.process_count() == N_PROC, jax.process_count()
    n_global = jax.device_count()
    assert n_global == N_PROC * DEV_PER_PROC, n_global
    assert len(jax.local_devices()) == DEV_PER_PROC

    # establish the cross-process gloo context with a TRIVIAL collective
    # before the heavy train-step compile: gloo bootstrap has a ~30s
    # key-value timeout, and two concurrent multi-minute compiles on a
    # 1-core host spread the processes' first-collective arrival past it
    from jax.sharding import NamedSharding, PartitionSpec as P

    warm = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")),
        np.ones(DEV_PER_PROC, np.float32), (n_global,))
    warm_sum = jax.jit(jnp.sum,
                       out_shardings=NamedSharding(mesh, P()))(warm)
    assert float(warm_sum) == n_global, float(warm_sum)

    H, W = 64, 96
    FH, FW = H // 16, W // 16
    model = LSFA(num_classes=5, feat_dim=64, num_layer=18, add_dcn=False,
                 add_small_net=True, add_Nq_net=True, rnet_num_conv=0)
    rng = jax.random.PRNGKey(0)
    z = jnp.zeros((1, H, W, 3))
    variables = model.init(rng, z, z, z, jnp.ones((1,)), jnp.ones((1,)),
                           jnp.zeros((1, FH, FW, 2)),
                           jnp.zeros((1, FH, FW, 3)))

    cfg = get_default_config()
    settings = TrainSettings.from_config(cfg)
    settings = type(settings)(**{**settings.__dict__, "num_classes": 5,
                                 "pre_nms_top_n": 64, "post_nms_top_n": 16,
                                 "rpn_batch": 32, "ohem_rois": 8})
    params = replicate(mesh, variables["params"])
    bstats = replicate(mesh, variables.get("batch_stats", {}))
    opt = make_optimizer(params, base_lr=1e-3, lr_steps=[1000])
    opt_state = jax.tree.map(
        lambda x: replicate(mesh, x) if hasattr(x, "shape") else x,
        opt.init(variables["params"]))
    step = make_train_step(model, settings, (FH, FW), opt)

    # each process contributes DEV_PER_PROC samples of the global batch;
    # deterministic content differs per global slot
    nprng = np.random.default_rng(7)
    gb = n_global
    gt = np.zeros((gb, 8, 5), np.float32)
    gt[:, 0] = [8.0, 8.0, 44.0, 44.0, 1.0]
    gtv = np.zeros((gb, 8), bool)
    gtv[:, 0] = True
    full = {
        "data": nprng.normal(0, 50, (gb, H, W, 3)).astype(np.float32),
        "data_ref": nprng.normal(0, 50, (gb, H, W, 3)).astype(np.float32),
        "data_ref_old": nprng.normal(0, 50, (gb, H, W, 3)).astype(np.float32),
        "eq_flag": np.zeros((gb,), np.float32),
        "eq_flag_old": np.zeros((gb,), np.float32),
        "motion_vector": np.zeros((gb, FH, FW, 2), np.float32),
        "res_diff": nprng.normal(0, 5, (gb, FH, FW, 3)).astype(np.float32),
        "gt_boxes": gt, "gt_valid": gtv,
        "im_info": np.tile(np.asarray([[H, W, 1.0]], np.float32), (gb, 1)),
    }
    lo = pid * DEV_PER_PROC
    sh = batch_sharding(mesh)
    batch = {
        k: jax.make_array_from_process_local_data(
            sh, v[lo:lo + DEV_PER_PROC], v.shape)
        for k, v in full.items()
    }

    params, bstats, opt_state, metrics = step(params, bstats, opt_state,
                                              batch, jax.random.PRNGKey(3))
    loss = float(metrics["total_loss"])
    # checksum of the (replicated) updated params: must match across procs
    leaves = jax.tree.leaves(params)
    csum = float(sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in leaves))
    print(json.dumps({"pid": pid, "process_count": jax.process_count(),
                      "global_devices": n_global, "loss": loss,
                      "param_checksum": round(csum, 3)}), flush=True)
    assert np.isfinite(loss), loss
    jax.distributed.shutdown()
    return 0


def parent(out: str) -> int:
    # children write to FILES, not pipes: both must run concurrently and
    # a filling pipe buffer would stall one child, tripping gloo's
    # connect timeout in the other
    procs, logs = [], []
    for pid in range(N_PROC):
        env = dict(
            os.environ,
            JAX_COMPILATION_CACHE_DIR=f"/tmp/jax_cache_{_host_tag()}",
            LSFA_MULTIHOST_CHILD=str(pid),
        )
        logs.append(open(f"/tmp/lsfa_multihost_{pid}.log", "w+"))
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=logs[-1], stderr=subprocess.STDOUT, text=True))
    results = []
    ok = True
    for pid, p in enumerate(procs):
        p.wait(timeout=1800)
        logs[pid].seek(0)
        output = logs[pid].read()
        line = [l for l in output.splitlines() if l.startswith("{")]
        if p.returncode != 0 or not line:
            ok = False
            print(f"worker {pid} FAILED rc={p.returncode}\n{output[-3000:]}",
                  file=sys.stderr)
            continue
        results.append(json.loads(line[-1]))
    if ok and len(results) == N_PROC:
        ok = (results[0]["loss"] == results[1]["loss"]
              and results[0]["param_checksum"] == results[1]["param_checksum"]
              and all(r["process_count"] == N_PROC for r in results))
    report = {"ok": ok, "n_processes": N_PROC,
              "devices_per_process": DEV_PER_PROC, "workers": results}
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    return 0 if ok else 1


if __name__ == "__main__":
    cpid = os.environ.get("LSFA_MULTIHOST_CHILD")
    if cpid is not None:
        sys.exit(child(int(cpid)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="MULTIHOST.json")
    args = ap.parse_args()
    sys.exit(parent(args.out))
