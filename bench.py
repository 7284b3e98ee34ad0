"""End-to-end LSFA inference benchmark on the current JAX default device.

Default mode measures the COMPLETE pipeline, video decode included: an
MPEG-4 stream is decoded + preprocessed to device payloads by the C++ data
plane (native/coviar) on a producer thread, overlapped with the device's
streaming detection loop — 1 key frame (full ResNet-101 + FlowNet + Nq
aggregation) + (KEY_FRAME_INTERVAL-1) non-key frames (MV warp + R-net +
small net) with full detection post-processing (proposals, PSROIPooling,
per-class NMS) at the 608x1024 bucket. This matches what the reference's
30 FPS Titan X headline measured (figs/results.png; README.md:8): a real
compressed stream in, detections out.

Reports the MEDIAN of N trials (all trials logged to stderr).
`--device-only` measures the device loop alone on pre-staged inputs.
`--clip PATH` benchmarks an arbitrary MPEG-4 clip instead of the
synthetic one (decode cost is content-dependent). `--overlap` disables
the per-window sync (cfg.tpu.sync_per_window=False): windows double-
buffer through the device — use on runtimes where overlapped transfers
are safe. `--f32` ships float32 MV/residual payloads
(cfg.tpu.mv_res_dtype) for parity/bisection runs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import queue
import sys
import threading
import time

import numpy as np

CLIP = "/tmp/lsfa_bench_clip.mp4"
CLIP_W, CLIP_H = 960, 576      # resizes to 600x1000 -> 608x1024 bucket
N_GOPS = 12
TRIALS = 5


def _build_detector(batch: int = 1, flags: list[str] | None = None):
    import jax
    import jax.numpy as jnp

    from lsfa_tpu.config import get_default_config
    from lsfa_tpu.eval.tester import StreamingDetector
    from lsfa_tpu.models.lsfa import lsfa_from_config

    if flags is None:
        flags = sys.argv[1:]
    cfg = get_default_config()
    if "--overlap" in flags:             # now the default; kept for A/B
        cfg.tpu.sync_per_window = False
    if "--sync" in flags:                # serialize windows (old runtime)
        cfg.tpu.sync_per_window = True
    if "--f32" in flags:
        cfg.tpu.mv_res_dtype = "float32"
    if "--bgr8" in flags:         # A/B: packed-BGR payloads (i420 default)
        cfg.tpu.frame_payload = "bgr8"
    if "--nms-pallas" in flags:   # A/B: fused-VMEM RPN-NMS kernel
        cfg.tpu.nms_pallas = True
    model = lsfa_from_config(cfg)
    h, w = cfg.tpu.default_bucket
    fh, fw = h // 16, w // 16
    rng = jax.random.PRNGKey(0)
    zdata = jnp.zeros((1, h, w, 3), jnp.float32)
    zmv = jnp.zeros((1, fh, fw, 2), jnp.float32)
    zres = jnp.zeros((1, fh, fw, 3), jnp.float32)
    variables = model.init(rng, zdata, zdata, zdata, jnp.ones((1,)),
                           jnp.ones((1,)), zmv, zres)
    det = StreamingDetector(model, variables, cfg, (h, w), batch=batch)
    return cfg, det


class E2EArm:
    """One end-to-end benchmark configuration: config + detector + prepared
    C++ decode + the windowed dispatch closure. Extracted from run_real so
    interleaved A/B runs (tools/ab_interleaved.py) can time two
    configurations in ALTERNATING trials inside one process — the tunneled
    host drifts +/-30% across hours, so sequential medians aren't
    comparable but adjacent-trial ratios are."""

    def __init__(self, flags: list[str] | None = None,
                 clip: str | None = None):
        import os

        from lsfa_tpu.data import coviar
        from lsfa_tpu.data.loader import PreparedVideo, payload_dtype

        if flags is None:
            flags = sys.argv[1:]
        if clip is None:
            clip = CLIP
            if not os.path.exists(clip):
                coviar.encode_test_video(clip, n_frames=N_GOPS * 12,
                                         w=CLIP_W, h=CLIP_H, gop_size=12,
                                         seed=3)
        self.clip = clip
        self.cfg, self.det = _build_detector(flags=flags)
        self.dt = payload_dtype(self.cfg)
        self.sync = bool(self.cfg.tpu.sync_per_window)
        self.pv = PreparedVideo(clip, self.cfg,
                                tuple(self.cfg.tpu.default_bucket))
        self.n_gops = (min(N_GOPS, self.pv.num_frames // 12)
                       if clip != CLIP else N_GOPS)
        if self.n_gops == 0:
            sys.exit(f"clip too short: {self.pv.num_frames} frames "
                     f"(< one 12-frame GOP) in {clip}")
        # Device program: process_gops (lax.scan over GOPs) — the SAME
        # program the device-only mode uses. Windows of G GOPs feed the
        # scan program; G=2 balances pipelining against latency (override
        # with --gops N for A/B runs).
        self.G = 2
        if "--gops" in flags:
            self.G = int(flags[flags.index("--gops") + 1])

    def dispatch(self, win, first, real):
        import jax

        # slice BEFORE stacking: only the key frame ships full-res (the
        # full stack would copy ~22 MB/GOP of non-key frames for nothing)
        key_frames = np.stack([w_[0][0:1] for w_ in win])  # (G, 1, H, W, 3)
        n_frames_win = sum(w_[0].shape[0] for w_ in win[:real])
        smalls = np.stack([w_[1][1:] for w_ in win])
        # payload dtype config-gated: f16 default (half the tunnel
        # traffic; the f32-input program variants reproducibly faulted
        # the axon backend — bisected round 2, re-check with --f32)
        mvs = np.stack([w_[2][1:] for w_ in win]).astype(self.dt)
        ress = np.stack([w_[3][1:] for w_ in win]).astype(self.dt)
        info = win[0][4][None]
        out = self.det.process_gops(key_frames, smalls, mvs, ress, info,
                                    first=first)
        if self.sync:
            # sync per window: overlapping the next window's host->device
            # transfer with in-flight compute faults the axon tunnel
            # runtime (round-1 finding, reproduced). Decode still
            # overlaps: the producer thread works through this wait.
            jax.block_until_ready(out[2])
        return n_frames_win, out

    def warmup(self):
        """One-time FFmpeg/export-mvs init + jit compile."""
        import jax

        warm = [self.pv.gop(0)] * self.G
        self.det.reset()
        _, wout = self.dispatch(warm, True, self.G)
        jax.block_until_ready(wout[2])


def e2e_trial(arm: E2EArm) -> tuple[float, float, float]:
    """One decode-included trial: a producer thread decoding GOPs through
    the C++ data plane, overlapped with the device window loop. Returns
    (fps, decode ms/frame, device-path ms/frame)."""
    import jax

    arm.pv._gop = -1                       # drop the GOP cache: real decode
    arm.det.reset()
    G = arm.G
    q: queue.Queue = queue.Queue(maxsize=2 * G)
    decode_s = [0.0]

    def producer():
        for g in range(arm.n_gops):
            t0 = time.perf_counter()
            payload = arm.pv.gop(g)
            arm.pv._gop = -1
            decode_s[0] += time.perf_counter() - t0
            q.put(payload)
        q.put(None)

    th = threading.Thread(target=producer, daemon=True)
    t0 = time.perf_counter()
    th.start()
    n_frames = 0
    dev_wait = 0.0
    first = True
    window = []
    done = False
    prev_out = None           # overlap mode: double-buffered windows
    while not done:
        item = q.get()
        if item is None:
            done = True
        else:
            window.append(item)
        if len(window) == G or (done and window):
            real = len(window)
            while len(window) < G:         # pad the tail window
                window.append(window[-1])
            d0 = time.perf_counter()
            nf, out = arm.dispatch(window, first, real)
            n_frames += nf
            if not arm.sync:
                # bound in-flight work to 2 windows: block on the
                # PREVIOUS window while this one computes/transfers
                if prev_out is not None:
                    jax.block_until_ready(prev_out[2])
                prev_out = out
            dev_wait += time.perf_counter() - d0
            first = False
            window = []
    if prev_out is not None:
        jax.block_until_ready(prev_out[2])
    wall = time.perf_counter() - t0
    return (n_frames / wall, decode_s[0] / n_frames * 1000,
            dev_wait / n_frames * 1000)


def run_real(clip: str | None = None) -> dict:
    """Decode-included pipeline: C++ prepared decode (producer thread)
    overlapped with the device GOP loop (consumer)."""
    import os

    arm = E2EArm(clip=clip)
    clip = arm.clip
    sync = arm.sync
    arm.warmup()

    fps_trials = []
    for trial in range(TRIALS):
        fps, host_ms, dev_ms = e2e_trial(arm)
        fps_trials.append(fps)
        print(f"trial {trial}: {fps:.1f} FPS (decode {host_ms:.1f} ms/f, "
              f"device-path {dev_ms:.1f} ms/f)", file=sys.stderr, flush=True)

    fps = float(np.median(fps_trials))
    print(f"all trials: {[round(f, 1) for f in fps_trials]}",
          file=sys.stderr, flush=True)
    mode = "overlapped windows" if not sync else "sync per window"
    src = "synthetic clip" if clip == CLIP else os.path.basename(clip)
    return {
        "metric": "lsfa_e2e_inference_fps",
        "value": round(fps, 2),
        "unit": ("frames/sec end-to-end incl. MPEG-4 decode+preprocess "
                 f"(608x1024, ResNet-101+DCN LSFA, key interval 12, {src}, "
                 f"{mode}, median of {TRIALS}; retried in a fresh process "
                 "on tunnel fault; host perf drifts +/-30% across hours — "
                 "compare across rounds only via tools/ab_interleaved.py)"),
        "vs_baseline": round(fps / 30.0, 3),
    }


def run_device_only() -> dict:
    """Device loop alone on pre-staged host arrays (the round-1 metric)."""
    import jax

    from lsfa_tpu.data.loader import payload_dtype

    cfg, det = _build_detector()
    dt = payload_dtype(cfg)
    h, w = cfg.tpu.default_bucket
    fh, fw = h // 16, w // 16
    interval = cfg.TEST.KEY_FRAME_INTERVAL
    n_cur = interval - 1

    rnd = np.random.default_rng(0)
    frame = rnd.integers(0, 255, size=(1, h, w, 3), dtype=np.uint8)
    from lsfa_tpu.data.image import small_pool_factor
    s = small_pool_factor(cfg.network.small_net_stride)
    small = np.clip(np.round(frame.astype(np.float32).reshape(
        1, h // s, s, w // s, s, 3).mean((2, 4))), 0, 255).astype(np.uint8)
    im_info = np.asarray([[563.0, 1000.0, 0.781]], np.float32)
    mv = rnd.normal(0, 1.5, size=(1, fh, fw, 2)).astype(dt)
    res = rnd.normal(0, 8, size=(1, fh, fw, 3)).astype(dt)
    smalls = np.repeat(small, n_cur, axis=0)
    mvs = np.repeat(mv, n_cur, axis=0)
    ress = np.repeat(res, n_cur, axis=0)

    G = 4
    key_frames = np.repeat(frame[None], G, axis=0)
    g_smalls = np.repeat(smalls[None], G, axis=0)
    g_mvs = np.repeat(mvs[None], G, axis=0)
    g_ress = np.repeat(ress[None], G, axis=0)

    def stage():
        return (jax.device_put(key_frames), jax.device_put(g_smalls),
                jax.device_put(g_mvs), jax.device_put(g_ress))

    def run_window(inputs, first=False):
        kf, sm, mv_, rs = inputs
        return det.process_gops(kf, sm, mv_, rs, im_info, first=first)

    det.reset()
    jax.block_until_ready(run_window(stage(), first=True)[2])

    n_windows = 6
    trials = []
    for trial in range(TRIALS):
        det.reset()
        t0 = time.perf_counter()
        for i in range(n_windows):
            out = run_window(stage(), first=(i == 0))
            jax.block_until_ready(out[2])
        dt = time.perf_counter() - t0
        trials.append(n_windows * G * interval / dt)
        print(f"trial {trial}: {trials[-1]:.1f} FPS", file=sys.stderr,
              flush=True)
    fps = float(np.median(trials))
    print(f"all trials: {[round(f, 1) for f in trials]}", file=sys.stderr,
          flush=True)
    return {
        "metric": "lsfa_device_inference_fps",
        "value": round(fps, 2),
        "unit": (f"frames/sec device loop only (608x1024, median of "
                 f"{TRIALS})"),
        "vs_baseline": round(fps / 30.0, 3),
    }


def run_latency() -> dict:
    """Online-serving metric: per-frame latency through the streaming
    per-frame programs (flag 0/1 key step, flag 2 non-key step) with a
    real decoded stream — what a live camera feed would see. Reports the
    non-key p50 (most frames) plus key p50/p95 and non-key p95."""
    import time as _t

    import jax

    from lsfa_tpu.data import coviar
    from lsfa_tpu.data.loader import PreparedVideo

    import os
    if not os.path.exists(CLIP):
        coviar.encode_test_video(CLIP, n_frames=N_GOPS * 12, w=CLIP_W,
                                 h=CLIP_H, gop_size=12, seed=3)
    cfg, det = _build_detector()
    bucket = tuple(cfg.tpu.default_bucket)
    pv = PreparedVideo(CLIP, cfg, bucket)
    interval = cfg.TEST.KEY_FRAME_INTERVAL

    # warmup both per-frame programs
    det.reset()
    data, small, mv, res, info = pv.frame(0)
    jax.block_until_ready(det.process_frame(data, info, flag=0)[0])
    data, small, mv, res, info = pv.frame(1)
    jax.block_until_ready(det.process_frame(
        None, info, mv, res, flag=2, small=small)[0])

    det.reset()
    key_ms, cur_ms = [], []
    n = min(pv.num_frames, 6 * interval)
    last_gop = -1
    decode_share_ms = 0.0
    for fid in range(n):
        flag = det.key_frame_flag(fid)
        # The C plane decodes whole GOPs; a live per-packet decoder pays
        # ~1/GOP of that on EVERY frame as its packet arrives. Attribute
        # decode per-frame (amortized) instead of dumping all 12 frames'
        # decode into the key frame's latency and none into the others'.
        g = fid // 12
        if g != last_gop:
            pv._gop = -1                # force a real decode
            t0 = _t.perf_counter()
            pv.gop(g)
            decode_share_ms = (_t.perf_counter() - t0) * 1000 / 12.0
            last_gop = g
        t0 = _t.perf_counter()          # camera-to-boxes minus decode
        data, small, mv, res, info = pv.frame(fid)
        if flag in (0, 1):
            d, v = det.process_frame(data, info, flag=flag)
        else:
            d, v = det.process_frame(None, info, mv, res, flag=2,
                                     small=small)
        np.asarray(d)                   # force the result to the host
        dt_ms = (_t.perf_counter() - t0) * 1000 + decode_share_ms
        (key_ms if flag in (0, 1) else cur_ms).append(dt_ms)
    key_ms, cur_ms = np.asarray(key_ms), np.asarray(cur_ms)
    for name, a in (("key", key_ms), ("non-key", cur_ms)):
        print(f"{name}: p50 {np.percentile(a, 50):.1f} ms  "
              f"p95 {np.percentile(a, 95):.1f} ms  n={len(a)}",
              file=sys.stderr, flush=True)
    return {
        "metric": "lsfa_online_frame_latency_ms",
        "value": round(float(np.percentile(cur_ms, 50)), 2),
        "unit": ("ms/frame online p50 non-key incl. per-frame amortized "
                 "decode (key p50 "
                 f"{np.percentile(key_ms, 50):.0f} ms, non-key p95 "
                 f"{np.percentile(cur_ms, 95):.0f} ms, 608x1024)"),
        # 30 FPS real-time budget = 33.3 ms/frame
        "vs_baseline": round(33.33 / float(np.percentile(cur_ms, 50)), 3),
    }


def run_multistream(lanes: int) -> dict:
    """Aggregate throughput: `lanes` video streams in lockstep through the
    lane-batched GOP-scan program (one dispatch per G GOPs x lanes frames)
    — the TPU-native form of the reference's multi-GPU video sharding."""
    import jax

    from lsfa_tpu.data.loader import payload_dtype

    cfg, det = _build_detector(batch=lanes)
    dt = payload_dtype(cfg)
    h, w = cfg.tpu.default_bucket
    fh, fw = h // 16, w // 16
    interval = cfg.TEST.KEY_FRAME_INTERVAL
    n = interval - 1
    G = 2
    rnd = np.random.default_rng(0)
    keys = rnd.integers(0, 255, (G, lanes, h, w, 3)).astype(np.uint8)
    smalls = rnd.integers(0, 255, (G, n, lanes, h // 4, w // 4, 3)).astype(np.uint8)
    mvs = rnd.normal(0, 1, (G, n, lanes, fh, fw, 2)).astype(dt)
    ress = rnd.normal(0, 8, (G, n, lanes, fh, fw, 3)).astype(dt)
    im_info = np.tile(np.asarray([[600.0, 1000.0, 1.04]], np.float32),
                      (lanes, 1))

    def stage():
        # async H2D of a fresh window's payloads — the DevicePrefetcher
        # role: staging rides the tunnel while the previous window computes
        return jax.device_put((keys, smalls, mvs, ress, im_info))

    det.reset()
    jax.block_until_ready(det.process_gops(keys, smalls, mvs, ress, im_info,
                                           first=True)[2])
    n_windows = 6
    trials = []
    for t in range(TRIALS):
        det.reset()
        t0 = time.perf_counter()
        nxt = stage()
        prev = None
        for i in range(n_windows):
            cur, nxt = nxt, (stage() if i + 1 < n_windows else None)
            out = det.process_gops(*cur, first=(i == 0))
            if prev is not None:       # one window in flight
                jax.block_until_ready(prev[2])
            prev = out
        jax.block_until_ready(prev[2])
        dt = time.perf_counter() - t0
        trials.append(n_windows * G * interval * lanes / dt)
        print(f"trial {t}: {trials[-1]:.1f} FPS aggregate ({lanes} lanes)",
              file=sys.stderr, flush=True)
    fps = float(np.median(trials))
    print(f"all trials: {[round(f, 1) for f in trials]}", file=sys.stderr,
          flush=True)
    return {
        "metric": "lsfa_multistream_device_fps",
        "value": round(fps, 2),
        "unit": (f"frames/sec aggregate, {lanes} lockstep streams, "
                 f"overlapped H2D staging + device loop (608x1024, "
                 f"median of {TRIALS})"),
        "vs_baseline": round(fps / 30.0, 3),
    }


def run_timeplex(streams: int) -> dict:
    """Aggregate end-to-end throughput over N REAL streams, decode
    included — the production multistream mode (VERDICT r4 item 4):
    streams are TIME-MULTIPLEXED through the single-lane GOP-scan
    program (the bench headline's peak-FPS program) with per-stream
    device-resident carries swapped between dispatches, NOT lane-batched
    lockstep (measured r4 to cost 3.6x the single-lane window for 3x the
    frames — an aggregate pessimization). One decode producer thread per
    stream; on this 1-core host aggregate decode is serial, so the bar
    is aggregate >= single-stream e2e; multi-core hosts scale decode
    per-stream until the device saturates."""
    import os

    import jax

    from lsfa_tpu.data import coviar

    # distinct clips (different content seeds) — same spec as the
    # headline clip so per-frame costs are comparable
    clips = []
    for s in range(streams):
        path = CLIP.replace(".mp4", f"_tp{s}.mp4")
        if not os.path.exists(path):
            coviar.encode_test_video(path, n_frames=N_GOPS * 12, w=CLIP_W,
                                     h=CLIP_H, gop_size=12, seed=3 + s)
        clips.append(path)

    from lsfa_tpu.data.loader import PreparedVideo

    # ONE detector/program set serves every stream; the other streams
    # contribute only their decoders (building N detectors would re-trace
    # the scan program N times for the same compiled executable)
    arm = E2EArm(flags=[], clip=clips[0])
    det = arm.det
    G = arm.G
    arm.warmup()
    bucket = tuple(arm.cfg.tpu.default_bucket)
    pvs = [arm.pv] + [PreparedVideo(c, arm.cfg, bucket)
                      for c in clips[1:]]
    n_gops = [min(N_GOPS, pv.num_frames // 12) for pv in pvs]
    states = [None] * streams

    def trial():
        qs = [queue.Queue(maxsize=2) for _ in range(streams)]
        decode_s = [0.0]

        def producer(s):
            pv = pvs[s]
            pv._gop = -1
            for g in range(n_gops[s]):
                t0 = time.perf_counter()
                payload = pv.gop(g)
                pv._gop = -1
                decode_s[0] += time.perf_counter() - t0
                qs[s].put(payload)
            qs[s].put(None)

        threads = [threading.Thread(target=producer, args=(s,),
                                    daemon=True) for s in range(streams)]
        t0 = time.perf_counter()
        for th in threads:
            th.start()
        from collections import deque
        live = deque(range(streams))
        windows = [[] for _ in range(streams)]
        firsts = [True] * streams
        done = [False] * streams
        n_frames = 0
        prev_out = None
        while live:
            s = live.popleft()
            item = qs[s].get()
            if item is None:
                done[s] = True
            else:
                windows[s].append(item)
                live.append(s)
            win = windows[s]
            if len(win) == G or (done[s] and win):
                real = len(win)
                while len(win) < G:
                    win.append(win[-1])
                if firsts[s]:
                    det.reset()
                else:
                    det.set_state(states[s])
                nf, out = arm.dispatch(win, firsts[s], real)
                states[s] = det.get_state()
                firsts[s] = False
                n_frames += nf
                if prev_out is not None:
                    jax.block_until_ready(prev_out[2])
                prev_out = out
                windows[s] = []
        if prev_out is not None:
            jax.block_until_ready(prev_out[2])
        wall = time.perf_counter() - t0
        return n_frames / wall, decode_s[0] / max(n_frames, 1) * 1000

    trials = []
    for t in range(TRIALS):
        fps, dec_ms = trial()
        trials.append(fps)
        print(f"trial {t}: {fps:.1f} FPS aggregate e2e ({streams} "
              f"time-multiplexed streams, decode {dec_ms:.1f} ms/f)",
              file=sys.stderr, flush=True)
    fps = float(np.median(trials))
    print(f"all trials: {[round(f, 1) for f in trials]}", file=sys.stderr,
          flush=True)
    return {
        "metric": "lsfa_timeplex_e2e_fps",
        "value": round(fps, 2),
        "unit": (f"frames/sec aggregate end-to-end incl. decode, "
                 f"{streams} time-multiplexed streams through the "
                 f"single-lane scan program (608x1024, median of "
                 f"{TRIALS})"),
        "vs_baseline": round(fps / 30.0, 3),
    }


def main():
    from lsfa_tpu.utils.env import setup_cache

    setup_cache()
    if "--timeplex" in sys.argv:
        result = run_timeplex(int(sys.argv[sys.argv.index("--timeplex") + 1]))
    elif "--multistream" in sys.argv:
        lanes = int(sys.argv[sys.argv.index("--multistream") + 1])
        result = run_multistream(lanes)
    elif "--device-only" in sys.argv:
        result = run_device_only()
    elif "--latency" in sys.argv:
        result = run_latency()
    else:
        clip = None
        if "--clip" in sys.argv:
            clip = sys.argv[sys.argv.index("--clip") + 1]
        result = run_real(clip)
    print(json.dumps(result))


if __name__ == "__main__":
    import os
    import subprocess

    if os.environ.get("LSFA_BENCH_INNER"):
        main()
    else:
        # the tunneled TPU occasionally reports transient UNAVAILABLE device
        # errors under sustained load; retry in a FRESH process (a poisoned
        # backend cannot be re-initialized in-process)
        env = dict(os.environ, LSFA_BENCH_INNER="1")

        def run_inner(argv, retries=3):
            """Fresh-process attempts; returns the JSON line or None."""
            for attempt in range(retries):
                r = subprocess.run([sys.executable,
                                    os.path.abspath(__file__)] + argv,
                                   env=env, stdout=subprocess.PIPE, text=True)
                if r.returncode == 0:
                    for line in reversed(r.stdout.splitlines()):
                        if line.startswith("{"):
                            return json.loads(line)
                print(f"bench attempt {attempt + 1} failed "
                      f"(rc={r.returncode}); cooling down before retry",
                      file=sys.stderr, flush=True)
                if attempt + 1 < retries:
                    time.sleep(120)
            return None

        result = run_inner(sys.argv[1:])
        if result is None:
            sys.exit(1)
        headline = not any(a.startswith("--") for a in sys.argv[1:])
        if headline and not os.environ.get("LSFA_BENCH_NO_MULTI"):
            # multistream companion number, in its own process so a fault
            # there can never cost the headline metric. Time-multiplexed
            # streams (r5) replaced lane-batched lockstep (a measured
            # aggregate pessimization: 3 lockstep lanes cost 3.6x the
            # single-lane window for 3x the frames); lockstep remains as
            # the opt-in --multistream mode for dispatch-bound hosts.
            multi = run_inner(["--timeplex", "3"], retries=1)
            if multi is not None:
                result["aggregate_3stream_timeplex_e2e_fps"] = multi["value"]
        print(json.dumps(result))
        sys.exit(0)
