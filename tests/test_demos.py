"""The demo entry points execute end-to-end (VERDICT r3 item 5).

The reference's own dff_rfcn/demo.py bit-rotted because nothing executed
it; these smokes run BOTH demos as real subprocesses on a synthetic clip
/ JPEG directory with the tiny config, asserting frames are annotated and
detections printed. Reference: dff_rfcn/demo.py:68-137,
demo_batch.py:43-121.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(ROOT, "configs", "lsfa_tiny_smoke.yaml")


def _run(args, timeout=1500):
    # JAX_PLATFORMS=cpu is honored because the launchers call
    # setup_cache() (utils/env.py) before any jax import — without it the
    # TPU plugin force-registers over the env var and can hang ~20 min in
    # backend-init retries while the pytest parent holds the device
    # tunnel. No cache-dir override: the subprocess uses the same
    # host-keyed persistent cache as the rest of the suite, so these
    # smokes reuse pre-warmed compilations instead of cold-compiling.
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run([sys.executable] + args, capture_output=True,
                          text=True, timeout=timeout, cwd=ROOT, env=env)


def test_demo_compressed_stream(tmp_path):
    """Default mode: MV/residual driven straight from an MPEG-4 clip."""
    video = str(tmp_path / "clip.mp4")
    out = str(tmp_path / "frames")
    r = _run([os.path.join(ROOT, "experiments", "demo.py"), "--cfg", CFG,
              "--video", video, "--out", out, "--synthesize",
              "--max-frames", "15"])
    assert r.returncode == 0, r.stderr[-3000:]
    pngs = sorted(f for f in os.listdir(out) if f.endswith(".png"))
    assert len(pngs) == 15
    # annotated output is a real image at source resolution
    from PIL import Image
    im = np.asarray(Image.open(os.path.join(out, pngs[0])))
    assert im.shape == (240, 320, 3)
    lines = [l for l in r.stdout.splitlines() if l.startswith("frame ")]
    assert len(lines) == 15
    # the key schedule ran: bootstrap key, then non-key frames
    assert "flag=0" in lines[0] and any("flag=2" in l for l in lines)


def test_demo_jpeg_directory(tmp_path):
    """Reference demo.py input mode: a directory of JPEG frames."""
    from PIL import Image
    d = tmp_path / "jpegs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        Image.fromarray(rng.integers(0, 255, (240, 320, 3), np.uint8)
                        ).save(d / f"{i:06d}.jpg")
    out = str(tmp_path / "frames")
    r = _run([os.path.join(ROOT, "experiments", "demo.py"), "--cfg", CFG,
              "--frames", str(d), "--out", out, "--max-frames", "8"])
    assert r.returncode == 0, r.stderr[-3000:]
    assert len([f for f in os.listdir(out) if f.endswith(".png")]) == 8


def test_demo_batch_gop(tmp_path):
    """Batched-GOP demo: one jitted forward for a whole GOP."""
    video = str(tmp_path / "clip.mp4")
    r = _run([os.path.join(ROOT, "experiments", "demo_batch.py"), "--cfg",
              CFG, "--video", video, "--synthesize"])
    assert r.returncode == 0, r.stderr[-3000:]
    lines = [l for l in r.stdout.splitlines() if l.startswith("frame ")]
    assert len(lines) == 12  # one GOP
    assert all("detections" in l for l in lines)
