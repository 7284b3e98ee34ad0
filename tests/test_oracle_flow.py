"""Oracle-warp data plane (VERDICT r4 item 1b).

The oracle rung substitutes the synthetic generator's analytic motion
for decoded MVs; these tests pin (1) that recording + deterministic
replay reproduce identical state for an already-encoded dataset, (2) the
grid's sign/unit/channel conventions by actually warping a key frame
image with it (flow_warp semantics, ops/warp.py), and (3) the
substitution points in the train/eval loaders.
"""

import os

import numpy as np
import pytest

from lsfa_tpu.data.oracle_flow import oracle_mv_grid, substitute_gop_mv
from lsfa_tpu.data.synth import make_synth_vid_dataset, render_video


def _render_recorded(w=160, h=128, n=18, pan=2.5, **kw):
    rng = np.random.default_rng(7)
    st: dict = {}
    frames, annos = render_video(w, h, n, rng, min_objects=2,
                                 max_objects=3, pan_speed=pan,
                                 zoom=0.1, speed=6.0, record_state=st, **kw)
    return frames, annos, st


def test_state_recording_shapes():
    frames, _, st = _render_recorded()
    n, h, w, _ = frames.shape
    assert st["cam"].shape == (n, 3)
    assert st["obj"].shape[0] == n and st["obj"].shape[2] == 3
    assert st["idmap8"].shape == (n, -(-h // 8), -(-w // 8))
    # ids: -2 bg, -1 occluder, >=0 objects
    assert st["idmap8"].min() >= -2
    assert st["idmap8"].max() < st["obj"].shape[1]


def test_recording_consumes_no_rng_draws():
    """A recorded render must produce the identical clip — replay relies
    on it."""
    rng1 = np.random.default_rng(3)
    f1, a1 = render_video(96, 80, 8, rng1, pan_speed=2.0)
    rng2 = np.random.default_rng(3)
    f2, _ = render_video(96, 80, 8, rng2, pan_speed=2.0,
                         record_state={})
    np.testing.assert_array_equal(f1, f2)


def test_grid_warps_key_frame_onto_current():
    """End-to-end convention check: flow_warp(key_image, grid) must
    reconstruct the current frame far better than no warp at all, at a
    non-trivial im_scale (units are feature cells of the RESIZED image)."""
    from lsfa_tpu.ops.warp import flow_warp

    frames, _, st = _render_recorded()
    h, w = frames.shape[1:3]
    stride, im_scale = 8, 0.5
    gh = int(np.ceil(h * im_scale / stride))
    gw = int(np.ceil(w * im_scale / stride))

    def grid_image(fidx):
        # block-mean of the resized frame at the grid resolution
        im = frames[fidx].astype(np.float32)
        s = int(round(stride / im_scale))       # orig pixels per cell
        im = im[:gh * s, :gw * s]
        return im.reshape(gh, s, gw, s, 3).mean((1, 3))

    key, cur = 0, 10
    grid = oracle_mv_grid(st, cur, key, gh, gw, im_scale, stride, (h, w))
    warped = np.asarray(flow_warp(grid_image(key), grid))
    target = grid_image(cur)
    # interior only: border cells lose content to zero-padding
    sl = np.s_[2:-2, 2:-2]
    err_warp = np.abs(warped[sl] - target[sl]).mean()
    err_none = np.abs(grid_image(key)[sl] - target[sl]).mean()
    assert err_warp < 0.55 * err_none, (err_warp, err_none)


def test_flip_mirrors_grid():
    _, _, st = _render_recorded()
    g = oracle_mv_grid(st, 6, 0, 8, 10, 0.5, 8, (128, 160))
    gf = oracle_mv_grid(st, 6, 0, 8, 10, 0.5, 8, (128, 160), flip=True)
    # dx mirrors+negates; dy mirrors. Compare on the interior of the
    # valid region (the mirrored sampling grid is offset by one cell's
    # rounding at the borders).
    np.testing.assert_allclose(gf[1:-1, 1:-1, 0],
                               -g[1:-1, 1:-1, 0][:, ::-1], atol=2.0)
    np.testing.assert_allclose(gf[1:-1, 1:-1, 1],
                               g[1:-1, 1:-1, 1][:, ::-1], atol=2.0)


def test_dataset_replay_matches_recorded_states(tmp_path):
    """States replayed for a dataset cached WITHOUT a sidecar must equal
    the states recorded at generation time."""
    kw = dict(n_videos=2, n_frames=12, seed=5, sizes=((128, 96),),
              gop_size=6, split="train", profile="easy")
    d = str(tmp_path)
    _, vids, _ = make_synth_vid_dataset(d, oracle=True, **kw)
    ref_states = [v["oracle"] for v in vids]
    # drop the sidecar; next oracle call must replay the generator
    side = [f for f in os.listdir(d) if f.endswith("_state.pkl")]
    assert len(side) == 1
    os.remove(os.path.join(d, side[0]))
    _, vids2, _ = make_synth_vid_dataset(d, oracle=True, **kw)
    for a, b in zip(ref_states, (v["oracle"] for v in vids2)):
        np.testing.assert_array_equal(a["cam"], b["cam"])
        np.testing.assert_array_equal(a["obj"], b["obj"])
        np.testing.assert_array_equal(a["idmap8"], b["idmap8"])


def test_substitute_gop_mv_zeroes_key():
    _, _, st = _render_recorded()
    mv = np.ones((6, 8, 10, 2), np.float32)
    out = substitute_gop_mv(mv, st, 6, 0.5, 8, (128, 160))
    assert np.all(out[0] == 0)
    assert np.any(out[1:] != 0)
    exp = oracle_mv_grid(st, 8, 6, 8, 10, 0.5, 8, (128, 160))
    np.testing.assert_allclose(out[2], exp)


@pytest.mark.skipif(
    not __import__("lsfa_tpu.data.loader", fromlist=["x"]
                   ).prepared_available(),
    reason="native data plane not built")
def test_loaders_substitute_oracle_mv(tmp_path):
    """Both substitution points: train-sample fast path + PreparedVideo."""
    from lsfa_tpu.config import load_config
    from lsfa_tpu.data.loader import PreparedVideo, load_pair_sample

    kw = dict(n_videos=1, n_frames=12, seed=5, sizes=((128, 96),),
              gop_size=12, split="train", profile="easy")
    froidb, vids, _ = make_synth_vid_dataset(str(tmp_path), oracle=True,
                                             **kw)
    cfg = load_config("configs/lsfa_tiny_smoke.yaml")
    cfg.network.oracle_mv = True
    rec = froidb[8]            # non-key frame of GOP 1
    rng = np.random.default_rng(0)
    s = load_pair_sample(rec, cfg, rng, bucket_hw=(128, 96))
    mv = s["motion_vector"][0]
    h, w = int(rec["height"]), int(rec["width"])
    if s["eq_flag"] == 0.0:
        exp = oracle_mv_grid(rec["oracle"], 8, 0, mv.shape[0], mv.shape[1],
                             float(s["im_info"][2]),
                             cfg.network.RCNN_FEAT_STRIDE, (h, w))
        np.testing.assert_allclose(mv, exp, atol=1e-5)

    pv = PreparedVideo(vids[0]["video_path"], cfg, (128, 96),
                       frames_mode=0, oracle=vids[0]["oracle"])
    _, _, mv_g, _, info = pv.gop(0)
    assert np.all(mv_g[0] == 0)
    exp = oracle_mv_grid(vids[0]["oracle"], 8, 0, mv_g.shape[1],
                         mv_g.shape[2], float(info[2]),
                         cfg.network.RCNN_FEAT_STRIDE, (96, 128))
    np.testing.assert_allclose(mv_g[8], exp, atol=1e-5)
