"""Bounded-delta guarantees for the config-gated frame payload wire
format (cfg.tpu.frame_payload).

The reference ships full BGR frames host->GPU (lib/utils/image.py:296-308
builds the f32 blob on the host). This port ships u8, and with
frame_payload="i420" ships planar YUV420 — HALF the bytes again (the
tunnel/PCIe serialization is host CPU time and byte-proportional). The
device converts YUV -> normalized RGB inside the jitted program
(models/lsfa.py::_preprocess_i420, BT.601 limited range).

These tests pin the i420 buffer layout + pad semantics, bound the pixel
delta vs the BGR path (chroma subsampling + fixed-point sws), prove the
pad region converts to EXACT zeros, and bound the end-to-end detection
delta between the two wire formats.
"""

import numpy as np
import pytest

from lsfa_tpu.config import load_config
from lsfa_tpu.data import coviar

if not coviar.available():
    pytest.skip("native loader not built", allow_module_level=True)

W, H = 96, 56            # stream size; resizes to (60, 103) at 60/104
TARGET, MAXSZ = 60, 104
BUCKET = (64, 112)       # the lsfa_tiny_smoke bucket
MEANS = [103.06, 115.90, 123.15]
SF = 4                   # small_pool_factor(small_net_stride=4)


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("clip") / "c.mp4")
    coviar.encode_test_video(p, n_frames=24, w=W, h=H, gop_size=12, seed=7)
    return p


def _decode(clip, fmt, mode=1):
    r = coviar.VideoReader(clip)
    try:
        return r.decode_gop_prepared(0, BUCKET, TARGET, MAXSZ, MEANS,
                                     stride=16, small_factor=SF,
                                     frames_mode=mode, payload_fmt=fmt)
    finally:
        r.close()


def _yuv_to_rgb(packed):
    """Numpy oracle of the device conversion (BT.601 limited range,
    nearest chroma upsampling)."""
    h = packed.shape[0] * 2 // 3
    w = packed.shape[1]
    y = packed[:h, :].astype(np.float64)
    u = packed[h:h + h // 4, :].reshape(h // 2, w // 2)
    v = packed[h + h // 4:, :].reshape(h // 2, w // 2)
    u = np.repeat(np.repeat(u, 2, 0), 2, 1).astype(np.float64) - 128.0
    v = np.repeat(np.repeat(v, 2, 0), 2, 1).astype(np.float64) - 128.0
    yf = (y - 16.0) * 1.164384
    r = yf + 1.596027 * v
    g = yf - 0.391762 * u - 0.812968 * v
    b = yf + 2.017232 * u
    return np.clip(np.stack([r, g, b], -1), 0, 255)


def test_i420_layout_and_pad(clip):
    frames, smalls, mv, res, info = _decode(clip, "i420")
    bh, bw = BUCKET
    assert frames.shape == (12, bh * 3 // 2, bw, 1)
    assert smalls.shape == (12, bh // SF * 3 // 2, bw // SF, 1)
    sh, sw = int(info[0]), int(info[1])
    assert (sh, sw) == (60, 103)
    key = frames[0, :, :, 0]
    # pad region: Y=16, U=V=128 (converts to exact zero on device)
    assert (key[sh:bh, :] == 16).all()          # Y rows below content
    assert (key[:sh, sw:] == 16).all()          # Y cols right of content
    u = key[bh:bh + bh // 4, :].reshape(bh // 2, bw // 2)
    v = key[bh + bh // 4:, :].reshape(bh // 2, bw // 2)
    ch, cw = (sh + 1) // 2, (sw + 1) // 2
    assert (u[ch:, :] == 128).all() and (u[:ch, cw:] == 128).all()
    assert (v[ch:, :] == 128).all() and (v[:ch, cw:] == 128).all()
    # content region is real data, not fill
    assert key[:sh, :sw].std() > 1.0
    # mv/res identical to the bgr8 decode (payload fmt only affects images)
    _, _, mv8, res8, info8 = _decode(clip, "bgr8")
    np.testing.assert_array_equal(mv, mv8)
    np.testing.assert_array_equal(res, res8)
    np.testing.assert_array_equal(info, info8)


def test_i420_requires_mode1(clip):
    # the ctypes wrapper rejects the combination up front (the C plane
    # also refuses it with rc -7 for raw callers)
    with pytest.raises(ValueError, match="frames_mode"):
        _decode(clip, "i420", mode=0)


def test_i420_key_frame_close_to_bgr(clip):
    """The i420 key frame, converted by the numpy oracle of the device
    path, must track the BGR-path key frame: the only differences are
    4:2:0 chroma subsampling + sws fixed point (the MPEG-4 source was
    4:2:0 to begin with, so little real information is lost)."""
    fi, si, *_ = _decode(clip, "i420")
    fb, sb, *_ = _decode(clip, "bgr8")
    rgb_i = _yuv_to_rgb(fi[0, :, :, 0])
    rgb_b = fb[0, :, :, ::-1].astype(np.float64)       # BGR -> RGB
    d = np.abs(rgb_i - rgb_b)
    assert d.mean() < 4.0, d.mean()
    assert np.percentile(d, 99) < 16.0, np.percentile(d, 99)
    # smalls: every slot (key included) carries an i420 small
    sm_i = _yuv_to_rgb(si[3, :, :, 0])
    sm_b = sb[3, :, :, ::-1].astype(np.float64)
    ds = np.abs(sm_i - sm_b)
    assert ds.mean() < 4.0, ds.mean()


def test_i420_device_preprocess_pad_is_exact_zero(clip):
    """model.preprocess on an i420 payload: pad region == (0 - mean) *
    scale EXACTLY (bitwise the BGR path's zero-padding), content region
    matches the numpy oracle."""
    import jax.numpy as jnp

    from lsfa_tpu.models.lsfa import lsfa_from_config

    cfg = load_config("configs/lsfa_tiny_smoke.yaml")
    model = lsfa_from_config(cfg)
    frames, _, _, _, info = _decode(clip, "i420")
    sh, sw = int(info[0]), int(info[1])
    bh, bw = BUCKET
    out = model.apply({"params": {}}, jnp.asarray(frames[0:1]),
                      method=model.preprocess)
    out = np.asarray(out)[0]
    assert out.shape == (bh, bw, 3)
    means_rgb = np.asarray(cfg.network.PIXEL_MEANS, np.float32)[::-1]
    pad_expected = (0.0 - means_rgb) * cfg.network.PIXEL_SCALE
    np.testing.assert_array_equal(out[sh:, :], np.broadcast_to(
        pad_expected, (bh - sh, bw, 3)).astype(np.float32))
    oracle = (_yuv_to_rgb(frames[0, :, :, 0]) - means_rgb) \
        * cfg.network.PIXEL_SCALE
    assert np.abs(out - oracle).max() < 1e-2


def test_i420_vs_bgr8_features_bounded(clip):
    """End-to-end through the network: the SAME GOP through forward_key
    and forward_cur with both wire formats — features and RPN objectness
    maps must track within ~1-2% relative. (Detection-level NMS output is
    not a stable comparator on a RANDOM-init net — a 1% input
    perturbation legitimately reorders near-tied scores — so the bound is
    at the feature/probability level; the pixel-level bound above plus
    this Lipschitz-style bound is what makes i420 safe as the production
    payload. Measured deltas on the tiny net: feat rel ~1.3%, rpn_fg
    mean |d| ~0.006.)"""
    import jax.numpy as jnp

    from lsfa_tpu.train.driver import init_model

    cfg = load_config("configs/lsfa_tiny_smoke.yaml")
    model, params, bs = init_model(cfg)
    variables = {"params": params, "batch_stats": bs}
    fdim = cfg.network.DFF_FEAT_DIM

    fi, si, mv, res, _ = _decode(clip, "i420")
    fb, sb, _, _, _ = _decode(clip, "bgr8")
    outs = {}
    for name, f, s in (("i420", fi, si), ("bgr8", fb, sb)):
        ko = model.apply(variables, jnp.asarray(f[0:1]),
                         jnp.zeros((1, 64, 112, 3)),
                         jnp.zeros((1, 4, 7, fdim)), jnp.ones((1,)),
                         method=model.forward_key)
        co = model.apply(variables, jnp.asarray(s[1:2]), ko["feat"],
                         jnp.asarray(mv[1:2]), jnp.asarray(res[1:2]),
                         method=model.forward_cur)
        outs[name] = (np.asarray(ko["feat"]), np.asarray(ko["rpn_fg"]),
                      np.asarray(co["feat"]), np.asarray(co["rpn_fg"]))

    for i, (label, bound) in enumerate((("key feat rel", 0.05),
                                        ("key rpn_fg", 0.03),
                                        ("cur feat rel", 0.05),
                                        ("cur rpn_fg", 0.03))):
        a, b = outs["i420"][i], outs["bgr8"][i]
        if "rel" in label:
            d = np.abs(a - b).mean() / (np.abs(b).mean() + 1e-9)
        else:
            d = np.abs(a - b).mean()
        assert d < bound, (label, d)


def test_small_src_yuv_drift_bounded(clip):
    """cfg.tpu.small_src="yuv" scales the decoder's native YUV planes
    straight to the small grid (one SWS_AREA pass) instead of the
    YUV->BGR->YUV round trip through the full-res conversion (~1 ms/f of
    host decode saved). Everything except the smalls must be BIT-IDENTICAL;
    the smalls drift only by the skipped colorspace round trip + chroma
    resample order (measured at 960x576: max 16, mean 1.5 on u8)."""
    r = coviar.VideoReader(clip)
    try:
        kw = dict(stride=16, small_factor=SF, frames_mode=1,
                  payload_fmt="i420")
        fb, sb, mvb, resb, ib = r.decode_gop_prepared(
            0, BUCKET, TARGET, MAXSZ, MEANS, small_src="bgr", **kw)
        fy, sy, mvy, resy, iy = r.decode_gop_prepared(
            0, BUCKET, TARGET, MAXSZ, MEANS, small_src="yuv", **kw)
    finally:
        r.close()
    assert np.array_equal(fb, fy)          # key frames untouched
    assert np.array_equal(mvb, mvy)
    assert np.array_equal(resb, resy)
    assert np.array_equal(ib, iy)
    d = np.abs(sb.astype(np.int16) - sy.astype(np.int16))
    assert d.max() <= 32, d.max()
    assert d.mean() <= 4.0, d.mean()
    # drift is sparse: mostly chroma edges
    assert (d > 8).mean() < 0.05


def test_small_src_yuv_requires_i420():
    with pytest.raises(ValueError):
        # wrapper-level validation of the small_src knob
        from lsfa_tpu.data.coviar import VideoReader  # noqa: F401
        r = None
        try:
            import tempfile, os
            p = os.path.join(tempfile.mkdtemp(), "c.mp4")
            coviar.encode_test_video(p, n_frames=12, w=W, h=H, gop_size=12)
            r = coviar.VideoReader(p)
            r.decode_gop_prepared(0, BUCKET, TARGET, MAXSZ, MEANS,
                                  stride=16, small_factor=SF,
                                  frames_mode=1, payload_fmt="i420",
                                  small_src="nope")
        finally:
            if r is not None:
                r.close()


def test_res_src_yuv_drift_bounded(clip):
    """cfg.tpu.res_src="yuv": residual-grid taps convert per-pixel from
    the decoder's YUV planes (BT.601, nearest chroma) so non-key frames
    skip the full-res YUV->BGR pass (~0.4 ms/f host). Only the residual
    grids may drift (key frames, smalls, MV grids bit-identical); the
    drift is the conversion rounding (measured at 960x576: max 2.8 raw
    residual units, mean 0.73)."""
    r = coviar.VideoReader(clip)
    try:
        kw = dict(stride=16, small_factor=SF, frames_mode=1,
                  payload_fmt="i420", small_src="yuv")
        fb, sb, mvb, resb, ib = r.decode_gop_prepared(
            0, BUCKET, TARGET, MAXSZ, MEANS, res_src="bgr", **kw)
        fy, sy, mvy, resy, iy = r.decode_gop_prepared(
            0, BUCKET, TARGET, MAXSZ, MEANS, res_src="yuv", **kw)
    finally:
        r.close()
    assert np.array_equal(fb, fy)
    assert np.array_equal(sb, sy)
    assert np.array_equal(mvb, mvy)
    assert np.array_equal(ib, iy)
    d = np.abs(resb - resy)
    assert d.max() <= 8.0, d.max()
    assert d.mean() <= 2.0, d.mean()


def test_res_src_validated():
    with pytest.raises(ValueError):
        r = None
        try:
            import tempfile, os
            p = os.path.join(tempfile.mkdtemp(), "c2.mp4")
            coviar.encode_test_video(p, n_frames=12, w=W, h=H, gop_size=12)
            r = coviar.VideoReader(p)
            r.decode_gop_prepared(0, BUCKET, TARGET, MAXSZ, MEANS,
                                  stride=16, small_factor=SF,
                                  frames_mode=1, payload_fmt="i420",
                                  res_src="nope")
        finally:
            if r is not None:
                r.close()


def test_bgr_to_i420_matches_device_converter():
    """Host packer (fallback-frame format consistency) must be the
    inverse of the device conversion: smooth content roundtrips tightly,
    zero padding roundtrips to EXACT zeros."""
    from lsfa_tpu.data.image import bgr_to_i420

    h, w = 32, 48
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    smooth = np.stack([40 + 3.1 * xx, 90 + 2.2 * yy,
                       120 + 1.1 * (xx + yy)], axis=-1)
    frame = np.clip(smooth, 0, 255).astype(np.uint8)[None]
    frame[:, 24:, :, :] = 0          # zero pad rows
    frame[:, :, 40:, :] = 0          # zero pad cols (even boundaries)
    packed = bgr_to_i420(frame)
    assert packed.shape == (1, h * 3 // 2, w, 1)
    rgb = _yuv_to_rgb(packed[0, :, :, 0])
    want = frame[0, :, :, ::-1].astype(np.float64)      # BGR -> RGB
    # content: chroma-subsampling error only (slowly varying chroma)
    assert np.abs(rgb[:24, :40] - want[:24, :40]).max() <= 4.0
    # pad: exact zeros after the device conversion
    assert np.abs(rgb[24:, :]).max() == 0.0
    assert np.abs(rgb[:, 40:]).max() == 0.0


def test_multistream_loader_uniform_wire_format(tmp_path):
    """Lane-batched loader with i420 payloads must keep ONE wire format
    when a video's frame_seg_len exceeds the stream (the reference hits
    this on every real video's last frame, lib/utils/image.py:45-55):
    the tail frame is packed to i420 instead of crashing np.concatenate
    with a (bh,bw,3) BGR odd-one-out."""
    from PIL import Image

    from lsfa_tpu.config import get_default_config
    from lsfa_tpu.eval.multistream import MultiStreamEvalLoader

    cfg = get_default_config()
    cfg.SCALES = [(TARGET, MAXSZ)]
    cfg.tpu.default_bucket = list(BUCKET)
    cfg.tpu.frame_payload = "i420"
    cfg.TEST.KEY_FRAME_INTERVAL = 12

    roidb = []
    for i, extra in enumerate((0, 1)):     # video 1: seg_len = frames + 1
        vp = str(tmp_path / f"v{i}.mp4")
        coviar.encode_test_video(vp, n_frames=24, w=W, h=H, gop_size=12,
                                 seed=i)
        jdir = tmp_path / f"jpg{i}"
        jdir.mkdir()
        for fid in range(24 + extra):
            Image.fromarray(np.full((H, W, 3), 50 + 7 * fid,
                                    np.uint8)).save(jdir / f"{fid:06d}.JPEG")
        roidb.append({"frame_seg_len": 24 + extra, "video_path": vp,
                      "pattern": str(jdir / "%06d.JPEG")})

    loader = MultiStreamEvalLoader(roidb, cfg, lanes=2, bucket_hw=BUCKET)
    assert loader._wire == "i420"
    n = 0
    for item in loader:
        assert item["data"].shape == (2, BUCKET[0] * 3 // 2, BUCKET[1], 1)
        assert item["small"].shape[-1] == 1
        n += 1
    assert n == loader.n_steps

    # a JPEG-only rec forces ONE format for every lane: bgr8
    roidb_mixed = [roidb[0],
                   {"frame_seg_len": 4, "video_path": None,
                    "pattern": roidb[1]["pattern"]}]
    loader = MultiStreamEvalLoader(roidb_mixed, cfg, lanes=2,
                                   bucket_hw=BUCKET)
    assert loader._wire == "bgr8"
    item = next(iter(loader))
    assert item["data"].shape == (2, BUCKET[0], BUCKET[1], 3)


def test_i420_odd_width_pad_boundary(clip):
    """Odd scaled content width (sw=103 here): 4:2:0 chroma sharing means
    the FIRST pad column shares its chroma sample with the last content
    column — it cannot be exact zero without corrupting content chroma.
    Pin the honest contract: that one column is bounded (chroma-only,
    Y=16), every pad column beyond it is EXACTLY zero."""
    import jax.numpy as jnp

    from lsfa_tpu.models.lsfa import lsfa_from_config

    cfg = load_config("configs/lsfa_tiny_smoke.yaml")
    model = lsfa_from_config(cfg)
    frames, _, _, _, info = _decode(clip, "i420")
    sh, sw = int(info[0]), int(info[1])
    assert sw % 2 == 1, "fixture must exercise an odd content width"
    bh, bw = BUCKET
    out = np.asarray(model.apply({"params": {}}, jnp.asarray(frames[0:1]),
                                 method=model.preprocess))[0]
    means_rgb = np.asarray(cfg.network.PIXEL_MEANS, np.float32)[::-1]
    pad_expected = ((0.0 - means_rgb) * cfg.network.PIXEL_SCALE
                    ).astype(np.float32)
    # beyond the shared-chroma column: exact zeros
    np.testing.assert_array_equal(
        out[:sh, sw + 1:],
        np.broadcast_to(pad_expected, (sh, bw - sw - 1, 3)))
    # the shared column: Y=16 (luma-zero), chroma bleeds from content --
    # bounded by the BT.601 chroma range (|cb|,|cr| <= 112 around 128)
    dev = np.abs(out[:sh, sw] - pad_expected).max()
    assert dev <= 230.0 * cfg.network.PIXEL_SCALE, dev


def test_multistream_pooled_decode_equals_serial(tmp_path):
    """tpu.decode_workers > 1 decodes lanes concurrently (per-lane
    PreparedVideo caches, ctypes drops the GIL); lanes are independent
    streams, so every batch must be BIT-identical to the serial path."""
    from lsfa_tpu.config import get_default_config
    from lsfa_tpu.eval.multistream import MultiStreamEvalLoader

    cfg = get_default_config()
    cfg.SCALES = [(TARGET, MAXSZ)]
    cfg.tpu.default_bucket = list(BUCKET)
    cfg.TEST.KEY_FRAME_INTERVAL = 12

    roidb = []
    for i in range(3):                     # 3 videos over 2 lanes
        vp = str(tmp_path / f"pv{i}.mp4")
        coviar.encode_test_video(vp, n_frames=24, w=W, h=H, gop_size=12,
                                 seed=10 + i)
        roidb.append({"frame_seg_len": 24, "video_path": vp,
                      "pattern": str(tmp_path / "none%06d.JPEG")})

    def run(workers):
        cfg.tpu.decode_workers = workers
        loader = MultiStreamEvalLoader(roidb, cfg, lanes=2,
                                       bucket_hw=BUCKET)
        return list(loader)

    serial, pooled = run(0), run(3)
    assert len(serial) == len(pooled)
    for a, b in zip(serial, pooled):
        assert a["flag"] == b["flag"]
        assert a["lane_meta"] == b["lane_meta"]
        np.testing.assert_array_equal(a["is_first"], b["is_first"])
        for k in ("data", "small", "motion_vector", "res_diff", "im_info"):
            np.testing.assert_array_equal(a[k], b[k])
