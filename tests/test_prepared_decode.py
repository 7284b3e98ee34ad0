"""C++ prepared-decode data plane: parity vs a numpy oracle of the
reference's cv2.INTER_LINEAR preprocessing (lib/utils/image.py:202-308).

The oracle re-states the two-stage transform_mv_res independently: naive
bilinear (half-pixel centers, src/dst size ratio, edge clamp — cv2
semantics, NOT PIL's antialiased filter), zero pad to the stride grid,
second bilinear down to the feature grid, then the channel transforms.
"""

import numpy as np
import pytest

from lsfa_tpu.data import coviar

if not coviar.available():
    pytest.skip("native loader not built", allow_module_level=True)

W, H = 192, 112          # stream size; resizes UP to (120, 205) at 120/192
TARGET, MAXSZ = 120, 208
BUCKET = (128, 224)
MEANS = [103.06, 115.90, 123.15]


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("clip") / "c.mp4")
    coviar.encode_test_video(p, n_frames=24, w=W, h=H, gop_size=12, seed=5)
    return p


def cv2_bilinear(src, out_h, out_w):
    """Naive bilinear with half-pixel centers + edge clamp (cv2 semantics;
    ratio = src/dst like cv2.resize)."""
    h, w = src.shape[:2]
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    ys = np.clip(ys, 0, h - 1)
    xs = np.clip(xs, 0, w - 1)
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    a = src[y0][:, x0]
    b = src[y0][:, x1]
    c = src[y1][:, x0]
    d = src[y1][:, x1]
    return ((1 - fy) * ((1 - fx) * a + fx * b)
            + fy * ((1 - fx) * c + fx * d))


def oracle_mv_res(mv_raw, res_raw, legacy_swap):
    """transform_mv_res with cv2 conventions, on the NEGATED mv like the
    loader (image.py:54), returning bucket-shaped grids."""
    h, w = mv_raw.shape[:2]
    s = TARGET / min(h, w)
    if round(s * max(h, w)) > MAXSZ:
        s = MAXSZ / max(h, w)
    sh, sw = int(round(h * s)), int(round(w * s))
    gh = int(np.ceil(sh / 16)) * 16
    gw = int(np.ceil(sw / 16)) * 16

    def two_stage(field):
        a = cv2_bilinear(field.astype(np.float64), sh, sw)
        p = np.zeros((gh, gw, field.shape[2]))
        p[:sh, :sw] = a
        return p

    mv_p = two_stage(-mv_raw.astype(np.float64))
    res_p = two_stage(res_raw.astype(np.float64))
    # channel transform on the padded field (reference order), incl. the
    # in-place bug when legacy_swap
    out = np.empty_like(res_p)
    out[:, :, 0] = res_p[:, :, 2] - MEANS[2]
    out[:, :, 1] = res_p[:, :, 1] - MEANS[1]
    src2 = out[:, :, 0] if legacy_swap else res_p[:, :, 0]
    out[:, :, 2] = src2 - MEANS[0]

    mv_g = cv2_bilinear(mv_p, gh // 16, gw // 16) * (s / 16)
    res_g = cv2_bilinear(out, gh // 16, gw // 16)
    bh, bw = BUCKET
    mv_full = np.zeros((bh // 16, bw // 16, 2))
    res_full = np.zeros((bh // 16, bw // 16, 3))
    mv_full[:gh // 16, :gw // 16] = mv_g
    res_full[:gh // 16, :gw // 16] = res_g
    return mv_full, res_full, (sh, sw, s)


@pytest.mark.parametrize("legacy", [False, True])
def test_prepared_mv_res_parity(clip, legacy):
    r = coviar.VideoReader(clip)
    bgr, mv_raw, res_raw = r.decode_gop(1)
    frames, smalls, mv, res, info = r.decode_gop_prepared(
        1, BUCKET, TARGET, MAXSZ, MEANS, legacy_swap=legacy)
    for rel in (1, 5, 11):
        want_mv, want_res, (sh, sw, s) = oracle_mv_res(
            mv_raw[rel], res_raw[rel], legacy)
        np.testing.assert_allclose(info, [sh, sw, s], rtol=1e-5)
        np.testing.assert_allclose(mv[rel], want_mv, atol=2e-3)
        np.testing.assert_allclose(res[rel], want_res, atol=2e-2)
    # key frame: zero MV; residual = the transformed-zeros CONSTANT grid
    # (the channel transform runs after padding — reference semantics)
    assert np.abs(mv[0]).sum() == 0
    gh, gw = (int(info[0]) + 15) // 16, (int(info[1]) + 15) // 16
    np.testing.assert_allclose(res[0][:gh, :gw, 0], -MEANS[2], atol=1e-4)
    np.testing.assert_allclose(res[0][:gh, :gw, 1], -MEANS[1], atol=1e-4)
    want2 = (-MEANS[2] - MEANS[0]) if legacy else -MEANS[0]
    np.testing.assert_allclose(res[0][:gh, :gw, 2], want2, atol=1e-4)
    assert np.abs(res[0][gh:]).sum() == 0


def test_prepared_frames_and_smalls(clip):
    r = coviar.VideoReader(clip)
    bgr, _, _ = r.decode_gop(0)
    frames, smalls, _, _, info = r.decode_gop_prepared(
        0, BUCKET, TARGET, MAXSZ, MEANS)
    sh, sw = int(info[0]), int(info[1])
    bh, bw = BUCKET
    # pad region exactly zero
    assert frames[:, sh:].sum() == 0 and frames[:, :, sw:].sum() == 0
    # image region: sws bilinear vs the numpy bilinear oracle (different
    # fixed-point filters -> small tolerance)
    want = cv2_bilinear(bgr[3].astype(np.float64), sh, sw)
    got = frames[3, :sh, :sw].astype(np.float64)
    assert np.abs(got - want).mean() < 3.0
    # small image == exact 4x4 box mean of the padded frame
    blocks = frames[3].reshape(bh // 4, 4, bw // 4, 4, 3).astype(np.float64)
    want_small = blocks.mean((1, 3))
    assert np.abs(smalls[3].astype(np.float64) - want_small).max() <= 0.5 + 1e-9


def test_prepared_matches_python_loader_contract(clip):
    """The prepared payloads must slot into the EvalLoader item contract:
    uint8 frames at the bucket, f32 grids at bucket/16."""
    r = coviar.VideoReader(clip)
    frames, smalls, mv, res, info = r.decode_gop_prepared(
        1, BUCKET, TARGET, MAXSZ, MEANS)
    assert frames.dtype == np.uint8 and smalls.dtype == np.uint8
    assert mv.dtype == np.float32 and res.dtype == np.float32
    bh, bw = BUCKET
    assert frames.shape[1:] == (bh, bw, 3)
    assert smalls.shape[1:] == (bh // 4, bw // 4, 3)
    assert mv.shape[1:] == (bh // 16, bw // 16, 2)
    assert res.shape[1:] == (bh // 16, bw // 16, 3)


def test_train_sample_fast_path_parity(clip):
    """coviar_decode_train_sample vs the Python load_pair_sample chain on
    the same record: same eq flags, same im_info, matching frames (sws vs
    PIL tolerance) and near-identical MV/residual grids (cv2-convention C
    vs PIL-resampled Python: both downsample the same fields; compared
    loosely since the fallback uses PIL filtering)."""
    from lsfa_tpu.config import get_default_config
    from lsfa_tpu.data.loader import load_pair_sample

    cfg = get_default_config()
    cfg.SCALES = [(TARGET, MAXSZ)]
    cfg.TRAIN.MIN_OFFSET = -9
    cfg.TRAIN.MAX_OFFSET = -9
    rec = {"image": "x.JPEG", "height": H, "width": W,
           "pattern": "x/%06d.JPEG", "frame_seg_id": 17, "frame_seg_len": 24,
           "video_path": clip,
           "boxes": np.asarray([[10.0, 10, 60, 50]], np.float32),
           "gt_classes": np.asarray([1], np.int32), "flipped": False}

    fast = load_pair_sample(rec, cfg, np.random.default_rng(0),
                            bucket_hw=BUCKET)
    slow = load_pair_sample(rec, cfg, np.random.default_rng(0))
    assert fast["eq_flag"] == slow["eq_flag"] == 0.0
    assert fast["eq_flag_old"] == slow["eq_flag_old"]
    np.testing.assert_allclose(fast["im_info"], slow["im_info"], rtol=1e-5)
    sh, sw = int(slow["im_info"][0]), int(slow["im_info"][1])
    # frames: fast is bucket-padded uint8; compare the real region
    a = fast["data"][0, :sh, :sw].astype(np.float64)
    b = slow["data"][0, :sh, :sw].astype(np.float64)
    assert np.abs(a - b).mean() < 4.0
    # grids: same real cells (fast is bucket-shaped, slow is grid-shaped)
    gh, gw = slow["motion_vector"].shape[1:3]
    mv_f = fast["motion_vector"][0, :gh, :gw]
    mv_s = slow["motion_vector"][0]
    # mean-based: C is cv2-exact (oracle-tested), the Python fallback uses
    # PIL's antialiased filter — isolated cells at MV block edges differ
    assert np.abs(mv_f - mv_s).mean() < 0.05
    rs_f = fast["res_diff"][0, :gh, :gw]
    rs_s = slow["res_diff"][0]
    assert np.abs(rs_f - rs_s).mean() < 6.0
    # bucket padding beyond the real grid is zero
    assert np.abs(fast["motion_vector"][0, gh:]).sum() == 0


def test_train_sample_fast_path_flip(clip):
    """Flip: the fast path must mirror frames and negate MV x like the
    Python path (append_flipped + loader, image.py flip handling)."""
    from lsfa_tpu.config import get_default_config
    from lsfa_tpu.data.loader import load_pair_sample

    cfg = get_default_config()
    cfg.SCALES = [(TARGET, MAXSZ)]
    cfg.TRAIN.MIN_OFFSET = -9
    cfg.TRAIN.MAX_OFFSET = -9
    base = {"image": "x.JPEG", "height": H, "width": W,
            "pattern": "x/%06d.JPEG", "frame_seg_id": 17,
            "frame_seg_len": 24, "video_path": clip,
            "boxes": np.asarray([[10.0, 10, 60, 50]], np.float32),
            "gt_classes": np.asarray([1], np.int32)}
    plain = load_pair_sample(dict(base, flipped=False), cfg,
                             np.random.default_rng(0), bucket_hw=BUCKET)
    flip = load_pair_sample(dict(base, flipped=True), cfg,
                            np.random.default_rng(0), bucket_hw=BUCKET)
    sh, sw = int(plain["im_info"][0]), int(plain["im_info"][1])
    a = plain["data"][0, :sh, :sw].astype(np.float64)
    b = flip["data"][0, :sh, :sw, :][:, ::-1].astype(np.float64)
    assert np.abs(a - b).mean() < 2.0
    # MV: flipped-x field mirrors and negates dx (loosely — resampling
    # grids differ slightly after mirroring)
    gh, gw = (sh + 15) // 16, (sw + 15) // 16
    mv_p = plain["motion_vector"][0, :gh, :gw]
    mv_f = flip["motion_vector"][0, :gh, :gw]
    assert np.abs(mv_p[..., 0] + mv_f[:, ::-1, 0]).mean() < 0.2
    assert np.abs(mv_p[..., 1] - mv_f[:, ::-1, 1]).mean() < 0.2


def test_frames_mode1_small_drift_bounded():
    """frames_mode=1 computes non-key smalls by a direct SWS_AREA resize
    of the raw frame instead of box-meaning the bilinear-resized padded
    frame (the mode-0 / streaming math). Round-2 advisor: quantify the
    drift. Measured: key frame exact, non-key mean |delta| ~0.16/255 with
    isolated pixels up to ~24 (pad-boundary cells + sws fixed point).
    This test pins those bounds so a regression (or a future exactness
    fix) is visible."""
    import numpy as np
    from lsfa_tpu.data import coviar

    if not coviar.available():
        pytest.skip("native plane not built")
    clip = "/tmp/lsfa_drift_bound.mp4"
    coviar.encode_test_video(clip, n_frames=24, w=480, h=288, gop_size=12,
                             seed=9)
    r = coviar.VideoReader(clip)
    kw = dict(stride=16, small_factor=4, legacy_swap=False)
    s0 = r.decode_gop_prepared(1, (608, 1024), 600, 1000, [0, 0, 0], 1.0,
                               frames_mode=0, **kw)[1].astype(np.int32)
    s1 = r.decode_gop_prepared(1, (608, 1024), 600, 1000, [0, 0, 0], 1.0,
                               frames_mode=1, **kw)[1].astype(np.int32)
    d = np.abs(s0 - s1)
    assert d[0].max() == 0                    # key frame: exact
    assert d.mean() < 1.0                     # non-key: tiny on average
    assert d.max() <= 48                      # no gross misalignment
    # drift is sparse: <1% of pixels move by more than 8/255
    assert (d > 8).mean() < 0.01


def test_native_error_message_surfaces(clip):
    """A failed prepared decode must raise with the native set_err()
    diagnostic, not just the negative frame count (round-3 review: the
    error strings were write-only)."""
    r = coviar.VideoReader(clip)
    try:
        with pytest.raises(IOError, match="bucket too small"):
            # stream resizes to ~(120,205); a 64x64 bucket can't hold it
            r.decode_gop_prepared(0, (64, 64), TARGET, MAXSZ, MEANS,
                                  stride=16, small_factor=4)
    finally:
        r.close()


def test_yuv_src_with_bgr8_rejected_in_wrapper(clip):
    """small_src/res_src='yuv' only exist for the i420 wire format; the
    ctypes wrapper must reject the combination with a clear ValueError
    instead of letting it fail deep in native code (rc -9)."""
    r = coviar.VideoReader(clip)
    try:
        with pytest.raises(ValueError, match="i420"):
            r.decode_gop_prepared(0, BUCKET, TARGET, MAXSZ, MEANS,
                                  stride=16, small_factor=4,
                                  frames_mode=1, payload_fmt="bgr8",
                                  small_src="yuv")
        with pytest.raises(ValueError, match="frames_mode"):
            r.decode_gop_prepared(0, BUCKET, TARGET, MAXSZ, MEANS,
                                  stride=16, small_factor=4,
                                  frames_mode=0, payload_fmt="i420")
    finally:
        r.close()
