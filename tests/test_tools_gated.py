"""Env-gated integration tests for the heavyweight tools.

These spawn real subprocesses (multi-minute compiles on the 1-core CI
host), so they run only when LSFA_SLOW_TOOL_TESTS=1 — the tools' results
are also committed as artifacts (MULTIHOST.json, runs/synth_r03/) from
real executions.
"""

import json
import os
import subprocess
import sys

import pytest

slow = pytest.mark.skipif(
    os.environ.get("LSFA_SLOW_TOOL_TESTS") != "1",
    reason="set LSFA_SLOW_TOOL_TESTS=1 to run the multi-minute tool tests")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@slow
def test_dryrun_multihost_tool(tmp_path):
    out = str(tmp_path / "mh.json")
    r = subprocess.run([sys.executable,
                        os.path.join(ROOT, "tools", "dryrun_multihost.py"),
                        "--out", out], capture_output=True, text=True,
                       timeout=1800, cwd=ROOT)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.load(open(out))
    assert rep["ok"] and len(rep["workers"]) == 2
    w0, w1 = rep["workers"]
    assert w0["loss"] == w1["loss"]
    assert w0["param_checksum"] == w1["param_checksum"]


@slow
def test_train_synth_full_cpu_smoke(tmp_path):
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "train_synth_full.py"),
         "--cpu-smoke", "--steps", "12", "--videos", "3", "--val-videos",
         "1", "--frames", "24", "--out", str(tmp_path / "run"),
         "--data", str(tmp_path / "data"), "--log-every", "4"],
        capture_output=True, text=True, timeout=1800, cwd=ROOT)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.load(open(tmp_path / "run" / "report.json"))
    assert rep["steps"] == 12 and rep["eval_frames"] > 0
    curves = [json.loads(l)
              for l in open(tmp_path / "run" / "curves.jsonl")]
    assert len(curves) >= 2 and all("total_loss" in c for c in curves)


@slow
def test_report_mfu_tiny_smoke(tmp_path):
    out = str(tmp_path / "mfu.json")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable,
                        os.path.join(ROOT, "tools", "report_mfu.py"),
                        "--tiny", "--trials", "2", "--gops", "2",
                        "--out", out], capture_output=True, text=True,
                       timeout=1800, cwd=ROOT, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.load(open(out))
    progs = rep["programs"]
    assert set(progs) == {"key_step", "cur_batch_step", "scan_window",
                          "train_step"}
    for name, row in progs.items():
        assert row["ms"] > 0 and row["gflop"] > 0, name
        assert row["arith_intensity_flop_per_byte"] > 0, name
    assert progs["scan_window"]["device_fps"] > 0
    assert progs["train_step"]["steps_per_s"] > 0


@slow
def test_eval_rung_cpu_smoke(tmp_path):
    # train a tiny rung, then re-evaluate its checkpoint on a fresh
    # val seed through tools/eval_rung.py (the extended-val path)
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "train_synth_full.py"),
         "--cpu-smoke", "--steps", "8", "--videos", "2", "--val-videos",
         "1", "--frames", "24", "--out", str(tmp_path / "run"),
         "--data", str(tmp_path / "data"), "--log-every", "4",
         "--rung", "mv_only"],
        capture_output=True, text=True, timeout=1800, cwd=ROOT)
    assert r.returncode == 0, r.stderr[-2000:]
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "eval_rung.py"),
         "--cpu-smoke", "--rung", "mv_only",
         "--ckpt", str(tmp_path / "run" / "checkpoints"),
         "--data", str(tmp_path / "data"), "--val-videos", "2",
         "--val-seed", "7", "--frames", "24",
         "--out", str(tmp_path / "xval")],
        capture_output=True, text=True, timeout=1800, cwd=ROOT)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.load(open(tmp_path / "xval" / "report_mv_only_xval.json"))
    assert rep["eval_frames"] == 48 and rep["val_seed"] == 7
    assert 0.0 <= rep["mAP_synth_val"] <= 1.0


@slow
def test_pretrain_flow_cpu_smoke(tmp_path):
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "pretrain_flow.py"),
         "--cpu-smoke", "--steps", "8", "--log-every", "4",
         "--out", str(tmp_path / "flow"), "--data", str(tmp_path / "data")],
        capture_output=True, text=True, timeout=1800, cwd=ROOT)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.load(open(tmp_path / "flow" / "flow_pretrain.json"))
    assert rep["steps"] == 8 and rep["photo_final"] > 0
    # the checkpoint is consumable by init_model's pretrained_flow branch
    from lsfa_tpu.train.checkpoint import load_checkpoint
    restored, step = load_checkpoint(str(tmp_path / "flow"))
    assert step == 8 and "flownet" in restored["params"]
