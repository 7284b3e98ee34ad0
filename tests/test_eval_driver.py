"""Integration: eval driver end-to-end over a synthesized video set ->
detections -> detection cache -> mAP report (the pred_eval +
evaluate_detections role)."""

import logging
import os

import numpy as np
import pytest
from PIL import Image

from lsfa_tpu.config import load_config
from lsfa_tpu.data import coviar
from lsfa_tpu.eval.driver import eval_videos, evaluate_map, shard_videos
from lsfa_tpu.train.driver import init_model
from tests.test_data_pipeline import write_xml

W, H = 128, 96
SEG_LEN = 24


@pytest.fixture(scope="module")
def eval_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("evalenv")
    dpath = root / "ILSVRC2015"
    vid_dir = "val/vid_e"
    iset = dpath / "ImageSets"
    os.makedirs(iset)
    with open(iset / "VID_val_videos.txt", "w") as f:
        f.write(f"{vid_dir} 1 0 {SEG_LEN}\n")
    for fid in range(SEG_LEN):
        img = np.full((H, W, 3), 70, np.uint8)
        p = dpath / "Data" / "VID" / vid_dir / f"{fid:06d}.JPEG"
        os.makedirs(os.path.dirname(p), exist_ok=True)
        Image.fromarray(img).save(p)
        write_xml(str(dpath / "Annotations" / "VID" / vid_dir / f"{fid:06d}.xml"),
                  W, H, [("n02131653", 20, 20, 70, 60)])
    if coviar.available():
        vp = dpath / "Data" / "VID" / "mpeg4_snippets" / (vid_dir + ".mp4")
        os.makedirs(os.path.dirname(vp), exist_ok=True)
        coviar.encode_test_video(str(vp), n_frames=SEG_LEN, w=W, h=H,
                                 gop_size=12, seed=5)
    return str(root), str(dpath), vid_dir


@pytest.fixture(scope="module")
def tiny_model():
    cfg = load_config("configs/lsfa_tiny_smoke.yaml")
    model, params, bs = init_model(cfg)
    return model, {"params": params, "batch_stats": bs}


def test_shard_videos_balances_by_frames():
    roidb = [{"frame_seg_len": n} for n in (100, 50, 50, 10)]
    shards = shard_videos(roidb, 2)
    loads = [sum(r["frame_seg_len"] for r in s) for s in shards]
    assert abs(loads[0] - loads[1]) <= 10


def test_eval_driver_end_to_end(eval_env, tmp_path, tiny_model):
    root, dpath, vid_dir = eval_env
    cfg = load_config("configs/lsfa_tiny_smoke.yaml")
    cfg.dataset.root_path = root
    cfg.dataset.dataset_path = dpath

    from lsfa_tpu.data.dataset import ImageNetVID

    ds = ImageNetVID("VID_val_videos", root, dpath)
    video_roidb = [{
        "vid_path": vid_dir,
        "frame_seg_len": SEG_LEN,
        "pattern": os.path.join(dpath, "Data", "VID", vid_dir, "%06d.JPEG"),
        "video_path": os.path.join(dpath, "Data", "VID", "mpeg4_snippets",
                                   vid_dir + ".mp4"),
    }]
    model, variables = tiny_model
    logger = logging.getLogger("evaltest")
    logger.addHandler(logging.NullHandler())

    cache = str(tmp_path / "dets.pkl")
    dets = eval_videos(model, variables, cfg, video_roidb,
                       det_cache=cache, logger=logger)
    assert len(dets) == SEG_LEN
    assert os.path.exists(cache)
    # cache round-trip returns identical structure without re-running
    dets2 = eval_videos(model, variables, cfg, video_roidb,
                        det_cache=cache, logger=logger)
    assert set(dets2.keys()) == set(dets.keys())

    mean_ap, ap = evaluate_map(dets, ds, video_roidb, logger=logger)
    # random weights: AP is defined (gt exists for class 3 'bear') and finite
    assert np.isfinite(mean_ap)
    assert 0.0 <= mean_ap <= 1.0


def test_eval_driver_partial_gop_tail(tmp_path, tiny_model):
    """A video whose length is NOT a multiple of GOP_SIZE must cover its
    trailing frames via the per-frame fallback WITHOUT crashing (round-2
    advisor: tail recs were appended with an unregistered base id ->
    KeyError), and global frame indices must stay aligned across a
    following video."""
    from lsfa_tpu.data.loader import prepared_available

    if not (coviar.available() and prepared_available()):
        pytest.skip("native prepared-decode plane not built")
    cfg = load_config("configs/lsfa_tiny_smoke.yaml")
    tail_len = 30                             # 2 GOPs + 6-frame tail
    vp = str(tmp_path / "tail_video.mp4")
    coviar.encode_test_video(vp, n_frames=tail_len, w=W, h=H,
                             gop_size=12, seed=7)
    jdir = tmp_path / "jpegs"
    os.makedirs(jdir)
    for fid in range(3):
        Image.fromarray(np.full((H, W, 3), 60 + 10 * fid, np.uint8)).save(
            jdir / f"{fid:06d}.JPEG")
    video_roidb = [
        {"vid_path": "val/tail_a", "frame_seg_len": tail_len,
         "pattern": str(jdir / "%06d.JPEG"), "video_path": vp},
        # JPEG-only video behind it: exercises the global index offset
        {"vid_path": "val/tail_b", "frame_seg_len": 3,
         "pattern": str(jdir / "%06d.JPEG"), "video_path": None},
    ]
    model, variables = tiny_model
    logger = logging.getLogger("tailtest")
    logger.addHandler(logging.NullHandler())
    dets = eval_videos(model, variables, cfg, video_roidb, logger=logger)
    assert sorted(dets.keys()) == list(range(tail_len + 3))


def test_eval_loader_starts_at_tail_start(tmp_path):
    """EvalLoader honors `_tail_start` (set by the GOP-scan driver on
    partial-GOP tail recs): it must yield ONLY frames >= tail_start, so
    the per-frame fallback doesn't re-decode the GOP-covered prefix."""
    from lsfa_tpu.data.loader import EvalLoader, prepared_available

    if not (coviar.available() and prepared_available()):
        pytest.skip("native prepared-decode plane not built")
    cfg = load_config("configs/lsfa_tiny_smoke.yaml")
    vp = str(tmp_path / "tail30.mp4")
    coviar.encode_test_video(vp, n_frames=30, w=W, h=H, gop_size=12, seed=9)
    rec = {"frame_seg_len": 30, "video_path": vp, "_tail_start": 24}
    fids = [item["frame_id"] for item in EvalLoader([rec], cfg)]
    assert fids == list(range(24, 30))


def test_gop_eval_gate_requires_interval_equal_gop(tmp_path, monkeypatch):
    """GOP-scan eligibility: KEY_FRAME_INTERVAL must EQUAL GOP_SIZE —
    a multiple (24) would silently key every GOP (12) instead of every 24
    frames (round-2 advisor finding)."""
    from lsfa_tpu.eval import driver as drv

    monkeypatch.setattr("lsfa_tpu.data.loader.prepared_available",
                        lambda: True)
    vp = tmp_path / "v.mp4"
    vp.write_bytes(b"x")
    rec = {"video_path": str(vp), "frame_seg_len": 24}
    cfg = load_config("configs/lsfa_tiny_smoke.yaml")
    assert drv._gop_eval_reason(rec, cfg) is None
    cfg.TEST.KEY_FRAME_INTERVAL = 24
    reason = drv._gop_eval_reason(rec, cfg)
    assert reason is not None and "KEY_FRAME_INTERVAL" in reason
    cfg.TEST.KEY_FRAME_INTERVAL = 12
    rec["frame_seg_len"] = 6
    assert drv._gop_eval_reason(rec, cfg) is not None


@pytest.fixture(scope="module")
def two_video_env(tmp_path_factory):
    """Two annotated 24-frame videos (mp4 + JPEG + XML) for lane tests."""
    root = tmp_path_factory.mktemp("laneenv")
    dpath = root / "ILSVRC2015"
    iset = dpath / "ImageSets"
    os.makedirs(iset)
    vids = ["val/lane_a", "val/lane_b"]
    with open(iset / "VID_val_videos.txt", "w") as f:
        for v in vids:
            f.write(f"{v} 1 0 {SEG_LEN}\n")
    for k, vid_dir in enumerate(vids):
        for fid in range(SEG_LEN):
            img = np.full((H, W, 3), 60 + 20 * k, np.uint8)
            p = dpath / "Data" / "VID" / vid_dir / f"{fid:06d}.JPEG"
            os.makedirs(os.path.dirname(p), exist_ok=True)
            Image.fromarray(img).save(p)
            write_xml(
                str(dpath / "Annotations" / "VID" / vid_dir / f"{fid:06d}.xml"),
                W, H, [("n02131653", 15 + 5 * k, 20, 70, 60)])
        if coviar.available():
            vp = dpath / "Data" / "VID" / "mpeg4_snippets" / (vid_dir + ".mp4")
            os.makedirs(os.path.dirname(vp), exist_ok=True)
            coviar.encode_test_video(str(vp), n_frames=SEG_LEN, w=W, h=H,
                                     gop_size=12, seed=11 + k)
    return str(root), str(dpath), vids


def test_multilane_launcher_equivalence(two_video_env, tiny_model):
    """`lsfa_test.py --lanes N` path: lane-batched eval must cover every
    frame and produce the same detections/mAP as single-lane — including
    lanes > #videos (idle-lane padding). Round-2 gap: the lane machinery
    existed but was unreachable from the mAP launcher."""
    from lsfa_tpu.data.dataset import ImageNetVID
    from lsfa_tpu.eval.driver import eval_videos_lanes

    root, dpath, vids = two_video_env
    cfg = load_config("configs/lsfa_tiny_smoke.yaml")
    cfg.dataset.root_path = root
    cfg.dataset.dataset_path = dpath
    ds = ImageNetVID("VID_val_videos", root, dpath)
    video_roidb = [{
        "vid_path": v,
        "frame_seg_len": SEG_LEN,
        "pattern": os.path.join(dpath, "Data", "VID", v, "%06d.JPEG"),
        "video_path": os.path.join(dpath, "Data", "VID", "mpeg4_snippets",
                                   v + ".mp4"),
    } for v in vids]
    model, variables = tiny_model
    logger = logging.getLogger("lanetest")
    logger.addHandler(logging.NullHandler())

    d1 = eval_videos_lanes(model, variables, cfg, video_roidb, lanes=1,
                           logger=logger)
    d3 = eval_videos_lanes(model, variables, cfg, video_roidb, lanes=3,
                           logger=logger)
    n_total = 2 * SEG_LEN
    assert sorted(d1.keys()) == list(range(n_total))
    assert sorted(d3.keys()) == list(range(n_total))
    tie_flips = 0
    for gidx in range(n_total):
        a, b = d1[gidx], d3[gidx]
        # batch-1 vs batch-3 programs: XLA reassociates conv sums, so
        # scores drift ~1e-6 and TIED-score NMS survivors can swap — a
        # random-init model produces many exact ties. Frame alignment is
        # what this guards: compare count + label multiset + sorted
        # score multiset per global frame index.
        assert a["labels"].shape == b["labels"].shape, gidx
        sa, sb = np.sort(a["scores"]), np.sort(b["scores"])
        if not np.allclose(sa, sb, atol=1e-4):
            # a near-tied NMS suppression decision flipped between the
            # batch-1 and batch-3 programs (conv reassociation drifts
            # scores ~1e-6; a random-init model is full of near-ties), so
            # a different box survived. Each flip swaps one multiset
            # entry for another; bound the blast radius by the tolerant
            # multiset symmetric difference, which a sorted element-wise
            # compare would exaggerate (one insertion shifts every rank).
            i = j = match = 0
            while i < len(sa) and j < len(sb):
                if abs(sa[i] - sb[j]) <= 1e-4:
                    match += 1; i += 1; j += 1
                elif sa[i] < sb[j]:
                    i += 1
                else:
                    j += 1
            unmatched = len(sa) + len(sb) - 2 * match
            assert unmatched <= 6, (gidx, unmatched)
            tie_flips += 1
    # flips are expected noise on a random-init model; the bound trips
    # on wholesale divergence (e.g. a cross-wired lane->frame mapping
    # would corrupt every frame's score multiset)
    assert tie_flips <= n_total // 4, tie_flips
    map1, _ = evaluate_map(d1, ds, video_roidb, logger=logger)
    map3, _ = evaluate_map(d3, ds, video_roidb, logger=logger)
    assert abs(map1 - map3) < 2e-3

    # --max-frames must cap the lane path too (it silently evaluated the
    # whole dataset before): 2 lanes x ceil(8/2) steps -> ~8 frames
    dcap = eval_videos_lanes(model, variables, cfg, video_roidb, lanes=2,
                             logger=logger, max_frames=8)
    assert 0 < len(dcap) <= 12, len(dcap)

    # and the launcher's single-lane GOP path agrees on mAP
    dets_gop = eval_videos(model, variables, cfg, video_roidb,
                           logger=logger)
    map_gop, _ = evaluate_map(dets_gop, ds, video_roidb, logger=logger)
    assert abs(map_gop - map1) < 5e-3


def test_bucket_picker_orientation():
    from lsfa_tpu.config import get_default_config
    from lsfa_tpu.data.image import pick_bucket

    cfg = get_default_config()
    buckets = [tuple(cfg.tpu.default_bucket)] + [
        tuple(b) for b in cfg.tpu.image_buckets]
    # landscape 720p -> landscape bucket
    assert pick_bucket(720, 1280, buckets, 600, 1000) == (608, 1024)
    # portrait -> the transposed bucket (would overflow 608 rows otherwise)
    assert pick_bucket(1280, 720, buckets, 600, 1000) == (1024, 608)
    # unfittable raises a clear error
    with pytest.raises(ValueError):
        pick_bucket(100, 100, [(32, 32)], 600, 1000)


def test_rfcn_launcher_path(two_video_env):
    """The single-frame RFCN baseline must produce a real mAP through the
    SAME launcher (run_test routes by symbol name) — per-frame
    full-backbone detection, full_frames prepared decode, --vis output.
    Round-3 gap: eval_videos assumed the LSFA streaming detector."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from experiments.lsfa_test import run_test

    root, dpath, vids = two_video_env
    cfg = load_config("configs/rfcn_tiny_smoke.yaml")
    cfg.dataset.root_path = root
    cfg.dataset.dataset_path = dpath
    cfg.output_path = str(dpath) + "/out_rfcn"
    mean_ap, ap = run_test(cfg, ignore_cache=True, vis_frames=2)
    assert np.isfinite(mean_ap) and 0.0 <= mean_ap <= 1.0
    import glob

    vis = glob.glob(os.path.join(cfg.output_path, "**", "vis", "*.jpg"),
                    recursive=True)
    assert len(vis) == 2


def test_test_launcher_finds_train_checkpoints(tmp_path):
    """The eval launcher's checkpoint auto-discovery must point at the
    directory the TRAIN driver actually writes (create_logger uses the
    '+'-joined image_set verbatim; reference test.py:57 convention)."""
    from experiments.lsfa_test import resolve_train_ckpt_dir
    from lsfa_tpu.config import load_config
    from lsfa_tpu.utils import create_logger

    cfg = load_config("configs/lsfa_tiny_smoke.yaml")
    cfg.output_path = str(tmp_path)
    cfg.dataset.image_set = "DET_train_30classes+VID_train_15frames"
    cfg.dataset.test_image_set = "VID_val_videos"

    # what train_net does (train/driver.py): out_dir/checkpoints/<prefix>
    _, train_out = create_logger(cfg.output_path, cfg.symbol,
                                 cfg.dataset.image_set)
    train_ckpt = os.path.join(train_out, "checkpoints",
                              cfg.TRAIN.model_prefix)
    os.makedirs(train_ckpt)

    _, test_out = create_logger(cfg.output_path, cfg.symbol,
                                cfg.dataset.test_image_set)
    assert resolve_train_ckpt_dir(cfg, test_out) == train_ckpt
