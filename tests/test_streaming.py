"""Integration: streaming key/non-key inference over a synthetic stream."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lsfa_tpu.config import get_default_config
from lsfa_tpu.eval.tester import StreamingDetector, collect_detections
from lsfa_tpu.models.lsfa import LSFA

H, W = 64, 96


@pytest.fixture(scope="module")
def detector():
    cfg = get_default_config()
    cfg.dataset.NUM_CLASSES = 5
    cfg.network.DFF_FEAT_DIM = 64
    cfg.network.num_layer = 18
    cfg.network.add_dcn = False
    cfg.tpu.default_bucket = (H, W)
    cfg.TEST.RPN_PRE_NMS_TOP_N = 128
    cfg.TEST.RPN_POST_NMS_TOP_N = 32
    cfg.TEST.max_per_image = 20
    model = LSFA(num_classes=5, feat_dim=64, num_layer=18, add_dcn=False)
    rng = jax.random.PRNGKey(0)
    data = jnp.zeros((1, H, W, 3))
    mv = jnp.zeros((1, H // 16, W // 16, 2))
    res = jnp.zeros((1, H // 16, W // 16, 3))
    variables = model.init(rng, data, data, data, jnp.ones((1,)),
                           jnp.ones((1,)), mv, res)
    return StreamingDetector(model, variables, cfg, (H, W))


def test_streaming_two_gops(detector):
    det = detector
    det.reset()
    rng = np.random.default_rng(0)
    im_info = np.asarray([[H - 4.0, W - 6.0, 1.0]], np.float32)
    flags_seen = []
    for fid in range(26):
        frame = rng.normal(0, 40, (1, H, W, 3)).astype(np.float32)
        flag = det.key_frame_flag(fid)
        flags_seen.append(flag)
        mv = rng.normal(0, 0.5, (1, H // 16, W // 16, 2)).astype(np.float32)
        res = rng.normal(0, 5, (1, H // 16, W // 16, 3)).astype(np.float32)
        d, v = det.process_frame(frame, im_info, mv, res)
        d = np.asarray(d)
        assert d.shape == (1, 20, 6)
        assert np.isfinite(d).all()
        out = collect_detections(d, v)
        # labels in range, boxes inside the (original-coordinate) image
        assert all(1 <= l <= 4 for l in out["labels"])
        if len(out["boxes"]):
            assert out["boxes"][:, 0].min() >= 0
            assert out["boxes"][:, 2].max() <= W - 1
    # schedule: key at 0 (bootstrap), 12, 24
    assert flags_seen[0] == 0
    assert flags_seen[12] == 1 and flags_seen[24] == 1
    assert flags_seen[1] == 2 and flags_seen[13] == 2
    # feature cache is live and finite
    assert np.isfinite(np.asarray(det.feat_key)).all()


def test_gop_batched_equals_streaming(detector):
    """process_gop (1 key step + 1 batched non-key step) must reproduce
    per-frame streaming exactly — non-key frames carry no recurrence."""
    det = detector
    rng = np.random.default_rng(7)
    im_info = np.asarray([[H - 2.0, W - 2.0, 1.0]], np.float32)
    key = rng.normal(0, 40, (1, H, W, 3)).astype(np.float32)
    n = 3
    s = 4
    frames = rng.normal(0, 40, (n, H, W, 3)).astype(np.float32)
    smalls = frames.reshape(n, H // s, s, W // s, s, 3).mean((2, 4))
    mvs = rng.normal(0, 0.5, (n, H // 16, W // 16, 2)).astype(np.float32)
    ress = rng.normal(0, 5, (n, H // 16, W // 16, 3)).astype(np.float32)

    det.reset()
    d0, v0 = det.process_frame(key, im_info, flag=0)
    stream = []
    for i in range(n):
        d, v = det.process_frame(None, im_info, mvs[i:i + 1], ress[i:i + 1],
                                 flag=2, small=smalls[i:i + 1])
        stream.append((np.asarray(d), np.asarray(v)))

    det.reset()
    kd, kv, cd, cv = det.process_gop(key, smalls, mvs, ress, im_info,
                                     first=True)
    np.testing.assert_allclose(np.asarray(kd), np.asarray(d0), atol=1e-5)
    for i in range(n):
        np.testing.assert_allclose(np.asarray(cd)[i], stream[i][0][0],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(cv)[i], stream[i][1][0])


def test_multi_gop_scan_equals_sequential(detector):
    """process_gops (lax.scan over G GOPs, one dispatch) must reproduce G
    sequential process_gop calls — the key recurrence rides the carry."""
    det = detector
    rng = np.random.default_rng(11)
    im_info = np.asarray([[H * 1.0, W * 1.0, 1.0]], np.float32)
    g, n, s = 3, 2, 4
    keys = rng.normal(0, 40, (g, 1, H, W, 3)).astype(np.float32)
    frames = rng.normal(0, 40, (g, n, H, W, 3)).astype(np.float32)
    smalls = frames.reshape(g, n, H // s, s, W // s, s, 3).mean((3, 5))
    mvs = rng.normal(0, 0.5, (g, n, H // 16, W // 16, 2)).astype(np.float32)
    ress = rng.normal(0, 5, (g, n, H // 16, W // 16, 3)).astype(np.float32)

    det.reset()
    seq = [det.process_gop(keys[i], smalls[i], mvs[i], ress[i], im_info,
                           first=(i == 0)) for i in range(g)]
    det.reset()
    kd, kv, cd, cv = det.process_gops(keys, smalls, mvs, ress, im_info,
                                      first=True)
    for i in range(g):
        np.testing.assert_allclose(np.asarray(kd)[i], np.asarray(seq[i][0]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(cd)[i], np.asarray(seq[i][2]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(cv)[i],
                                      np.asarray(seq[i][3]))


def test_lt_off_equals_reset_per_gop(detector):
    """lt_off=True (the eval-time long-term-aggregation ablation) must
    equal resetting the detector before every GOP: each key frame takes
    the bootstrap select, so the cached key feature contributes nothing.
    Exercises both the scan route and per-frame flag-1 dispatch."""
    base = detector
    rng = np.random.default_rng(23)
    im_info = np.asarray([[H * 1.0, W * 1.0, 1.0]], np.float32)
    g, n, s = 3, 2, 4
    keys = rng.normal(0, 40, (g, 1, H, W, 3)).astype(np.float32)
    frames = rng.normal(0, 40, (g, n, H, W, 3)).astype(np.float32)
    smalls = frames.reshape(g, n, H // s, s, W // s, s, 3).mean((3, 5))
    mvs = rng.normal(0, 0.5, (g, n, H // 16, W // 16, 2)).astype(np.float32)
    ress = rng.normal(0, 5, (g, n, H // 16, W // 16, 3)).astype(np.float32)

    # oracle: fresh stream per GOP (first=True -> bootstrap select)
    oracle = []
    for i in range(g):
        base.reset()
        oracle.append(base.process_gop(keys[i], smalls[i], mvs[i], ress[i],
                                       im_info, first=True))

    det = StreamingDetector(base.model, base.variables, base.cfg, (H, W),
                            lt_off=True)
    kd, kv, cd, cv = det.process_gops(keys, smalls, mvs, ress, im_info,
                                      first=True)
    for i in range(g):
        np.testing.assert_allclose(np.asarray(kd)[i],
                                   np.asarray(oracle[i][0]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(cd)[i],
                                   np.asarray(oracle[i][2]),
                                   rtol=1e-4, atol=1e-4)

    # per-frame route: a flag-1 key frame under lt_off matches flag 0
    det.reset()
    d1, v1 = det.process_frame(keys[1], im_info, flag=1)
    base.reset()
    d0, v0 = base.process_frame(keys[1], im_info, flag=0)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))


def test_lane_sharded_equals_local(detector):
    """8 lanes sharded over the 8-device mesh must produce the same
    detections as 8 local (single-device) lanes — inference DP over the
    mesh (ref role: function/test_rcnn.py:69-75)."""
    from lsfa_tpu.parallel import make_mesh

    cfg = detector.cfg
    model, variables = detector.model, detector.variables
    lanes = 8
    rng = np.random.default_rng(3)
    im_info = np.tile(np.asarray([[H * 1.0, W * 1.0, 1.0]], np.float32),
                      (lanes, 1))
    key = rng.normal(0, 40, (lanes, H, W, 3)).astype(np.float32)
    mv = rng.normal(0, 0.5, (lanes, H // 16, W // 16, 2)).astype(np.float32)
    res = rng.normal(0, 5, (lanes, H // 16, W // 16, 3)).astype(np.float32)
    cur = rng.normal(0, 40, (lanes, H, W, 3)).astype(np.float32)

    outs = []
    for mesh in (None, make_mesh()):
        det = StreamingDetector(model, variables, cfg, (H, W), batch=lanes,
                                mesh=mesh)
        det.reset()
        d0, v0 = det.process_frame(key, im_info, flag=0)
        d1, v1 = det.process_frame(cur, im_info, mv, res, flag=2)
        outs.append((np.asarray(d0), np.asarray(v0),
                     np.asarray(d1), np.asarray(v1)))
        if mesh is not None:
            # state must actually live sharded over the mesh
            assert len(det.feat_key.sharding.device_set) == 8
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
    np.testing.assert_allclose(outs[0][2], outs[1][2], rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(outs[0][3], outs[1][3])


def test_lane_batched_gop_scan_equals_streaming(detector):
    """Lane-batched multi-GOP scan (B videos in lockstep through one scan
    program) must reproduce per-frame streaming at batch B — the
    throughput mode composing the recurrence batching (SURVEY §5) with
    inference DP."""
    cfg = detector.cfg
    model, variables = detector.model, detector.variables
    B, g, n, s = 2, 2, 3, 4
    det = StreamingDetector(model, variables, cfg, (H, W), batch=B)
    rng = np.random.default_rng(21)
    im_info = np.tile(np.asarray([[H * 1.0, W * 1.0, 1.0]], np.float32),
                      (B, 1))
    keys = rng.normal(0, 40, (g, B, H, W, 3)).astype(np.float32)
    frames = rng.normal(0, 40, (g, n, B, H, W, 3)).astype(np.float32)
    smalls = frames.reshape(g, n, B, H // s, s, W // s, s, 3).mean((4, 6))
    mvs = rng.normal(0, 0.5, (g, n, B, H // 16, W // 16, 2)).astype(np.float32)
    ress = rng.normal(0, 5, (g, n, B, H // 16, W // 16, 3)).astype(np.float32)

    # reference: per-frame streaming at batch B
    det.reset()
    stream = []
    for gi in range(g):
        d, v = det.process_frame(keys[gi], im_info,
                                 flag=0 if gi == 0 else 1)
        stream.append((np.asarray(d), np.asarray(v)))
        for i in range(n):
            d, v = det.process_frame(None, im_info, mvs[gi, i], ress[gi, i],
                                     flag=2, small=smalls[gi, i])
            stream.append((np.asarray(d), np.asarray(v)))

    # lane-batched scan: one dispatch
    det.reset()
    kd, kv, cd, cv = det.process_gops(keys, smalls, mvs, ress, im_info,
                                      first=True)
    kd, cd, cv = np.asarray(kd), np.asarray(cd), np.asarray(cv)
    # folded (n*B) batch vs vmapped batch fuse differently -> tiny FP
    # differences in box coords; atol 1e-2 px
    for gi in range(g):
        np.testing.assert_allclose(kd[gi], stream[gi * (n + 1)][0],
                                   rtol=1e-3, atol=1e-2)
        for i in range(n):
            np.testing.assert_allclose(
                cd[gi, i], stream[gi * (n + 1) + 1 + i][0],
                rtol=1e-3, atol=1e-2)
            np.testing.assert_array_equal(
                cv[gi, i], stream[gi * (n + 1) + 1 + i][1])


def test_small_net_stride8_streaming():
    """small_net_stride=8 end-to-end: the host ships a 1/2-downscaled frame,
    the small trunk runs 2 stages and fuses its stage-2 (stride-8 relative,
    /16 absolute) feature (reference fuse_small_net :216-224)."""
    cfg = get_default_config()
    cfg.dataset.NUM_CLASSES = 5
    cfg.network.DFF_FEAT_DIM = 64
    cfg.network.num_layer = 18
    cfg.network.add_dcn = False
    cfg.network.small_net_stride = 8
    cfg.tpu.default_bucket = (H, W)
    cfg.TEST.RPN_PRE_NMS_TOP_N = 128
    cfg.TEST.RPN_POST_NMS_TOP_N = 32
    cfg.TEST.max_per_image = 20
    model = LSFA(num_classes=5, feat_dim=64, num_layer=18, add_dcn=False,
                 small_net_stride=8)
    rng = jax.random.PRNGKey(0)
    data = jnp.zeros((1, H, W, 3))
    mv = jnp.zeros((1, H // 16, W // 16, 2))
    res = jnp.zeros((1, H // 16, W // 16, 3))
    variables = model.init(rng, data, data, data, jnp.ones((1,)),
                           jnp.ones((1,)), mv, res)
    det = StreamingDetector(model, variables, cfg, (H, W))
    det.reset()
    rngn = np.random.default_rng(0)
    im_info = np.asarray([[H * 1.0, W * 1.0, 1.0]], np.float32)
    frame = rngn.normal(0, 40, (1, H, W, 3)).astype(np.float32)
    det.process_frame(frame, im_info, flag=0)
    # non-key frame ships the HALF-res small image (stride 8 -> factor 2)
    small = frame.reshape(1, H // 2, 2, W // 2, 2, 3).mean((2, 4))
    d, v = det.process_frame(None, im_info,
                             np.zeros((1, H // 16, W // 16, 2), np.float32),
                             np.zeros((1, H // 16, W // 16, 3), np.float32),
                             flag=2, small=small)
    assert np.isfinite(np.asarray(d)).all()
    assert np.asarray(d).shape == (1, 20, 6)


def test_feature_cache_persistence(detector):
    """Non-key frames must reuse the key feature (zero MV + zero residual
    => propagated feature ~ small-net-fused key feature, deterministic)."""
    det = detector
    det.reset()
    rng = np.random.default_rng(1)
    im_info = np.asarray([[H * 1.0, W * 1.0, 1.0]], np.float32)
    key_frame = rng.normal(0, 40, (1, H, W, 3)).astype(np.float32)
    det.process_frame(key_frame, im_info, flag=0)
    feat_after_key = np.asarray(det.feat_key).copy()
    cur = rng.normal(0, 40, (1, H, W, 3)).astype(np.float32)
    det.process_frame(cur, im_info,
                      np.zeros((1, H // 16, W // 16, 2), np.float32),
                      np.zeros((1, H // 16, W // 16, 3), np.float32), flag=2)
    # the cache must NOT be overwritten by a non-key frame
    np.testing.assert_array_equal(np.asarray(det.feat_key), feat_after_key)


def test_standalone_gop_program_equals_scan_route(detector):
    """cfg.tpu.scan_only=False compiles the standalone single-GOP program
    (_gop_step); its outputs must match the default scan-routed
    process_gop (the two are alternative lowerings of the same math)."""
    det = detector
    rng = np.random.default_rng(11)
    im_info = np.asarray([[H - 2.0, W - 2.0, 1.0]], np.float32)
    key = rng.normal(0, 40, (1, H, W, 3)).astype(np.float32)
    n, s = 3, 4
    frames = rng.normal(0, 40, (n, H, W, 3)).astype(np.float32)
    smalls = frames.reshape(n, H // s, s, W // s, s, 3).mean((2, 4))
    mvs = rng.normal(0, 0.5, (n, H // 16, W // 16, 2)).astype(np.float32)
    ress = rng.normal(0, 5, (n, H // 16, W // 16, 3)).astype(np.float32)

    det.reset()
    ref = det.process_gop(key, smalls, mvs, ress, im_info, first=True)
    ref = [np.asarray(x) for x in ref]

    cfg2 = det.cfg.copy()
    cfg2.tpu.scan_only = False
    det2 = StreamingDetector(det.model, det.variables, cfg2, (H, W))
    got = det2.process_gop(key, smalls, mvs, ress, im_info, first=True)
    got = [np.asarray(x) for x in got]
    # ref kd has the scan's leading G axis squeezed to batch form already
    np.testing.assert_allclose(got[0], ref[0], rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(got[1], ref[1])
    np.testing.assert_allclose(got[2], ref[2], rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(got[3], ref[3])
    # and the recurrent state advanced identically
    np.testing.assert_allclose(np.asarray(det2.feat_key),
                               np.asarray(det.feat_key), rtol=1e-4,
                               atol=1e-4)
