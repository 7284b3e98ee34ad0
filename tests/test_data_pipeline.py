"""Dataset + loader tests over a synthesized miniature ILSVRC tree."""

import os

import numpy as np
import pytest
from PIL import Image

from lsfa_tpu.config import get_default_config
from lsfa_tpu.data import coviar
from lsfa_tpu.data.dataset import ImageNetVID, append_flipped, filter_roidb
from lsfa_tpu.data.image import resize, transform, transform_mv_res
from lsfa_tpu.data.loader import EvalLoader, TrainLoader

W, H = 128, 96
SEG_LEN = 24


def write_xml(path, w, h, boxes):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    objs = "".join(
        f"<object><name>{wnid}</name><bndbox>"
        f"<xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax>"
        f"</bndbox></object>"
        for wnid, x1, y1, x2, y2 in boxes)
    with open(path, "w") as f:
        f.write(f"<annotation><size><width>{w}</width><height>{h}</height>"
                f"</size>{objs}</annotation>")


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ilsvrc")
    dpath = root / "ILSVRC2015"
    vid_dir = "train/vid_a"
    # imageset: VID-style lines "path frame_id seg_id seg_len"
    iset = dpath / "ImageSets"
    os.makedirs(iset)
    with open(iset / "VID_train_15frames.txt", "w") as f:
        for fid in (2, 7, 13):
            f.write(f"{vid_dir} 1 {fid} {SEG_LEN}\n")
    with open(iset / "VID_val_videos.txt", "w") as f:
        f.write(f"{vid_dir} 1 0 {SEG_LEN}\n")
    # frames + annotations
    for fid in range(SEG_LEN):
        img = np.full((H, W, 3), (fid * 8) % 255, np.uint8)
        p = dpath / "Data" / "VID" / vid_dir / f"{fid:06d}.JPEG"
        os.makedirs(os.path.dirname(p), exist_ok=True)
        Image.fromarray(img).save(p)
        write_xml(str(dpath / "Annotations" / "VID" / vid_dir / f"{fid:06d}.xml"),
                  W, H, [("n02691156", 10, 10, 60, 50)])
    # compressed snippet
    if coviar.available():
        vp = dpath / "Data" / "VID" / "mpeg4_snippets" / (vid_dir + ".mp4")
        os.makedirs(os.path.dirname(vp), exist_ok=True)
        coviar.encode_test_video(str(vp), n_frames=SEG_LEN, w=W, h=H,
                                 gop_size=12, seed=3)
    return str(root), str(dpath), vid_dir


def test_dataset_parse_and_roidb(mini_dataset):
    root, dpath, vid_dir = mini_dataset
    ds = ImageNetVID("VID_train_15frames", root, dpath)
    assert ds.num_images == 3
    roidb = ds.gt_roidb(use_cache=False)
    rec = roidb[0]
    assert rec["height"] == H and rec["width"] == W
    assert rec["gt_classes"].tolist() == [1]        # airplane
    np.testing.assert_allclose(rec["boxes"][0], [10, 10, 60, 50])
    assert rec["frame_seg_len"] == SEG_LEN
    # flip augmentation mirrors boxes
    flipped = append_flipped(roidb)
    assert len(flipped) == 6
    fb = flipped[3]["boxes"][0]
    np.testing.assert_allclose(fb, [W - 60 - 1, 10, W - 10 - 1, 50])
    assert len(filter_roidb(flipped)) == 6


def test_preprocessing_shapes():
    im = np.random.default_rng(0).uniform(0, 255, (H, W, 3)).astype(np.float32)
    out, scale = resize(im, 60, 100)
    assert min(out.shape[:2]) == 60 or max(out.shape[:2]) == 100
    t = transform(out, [103.0, 116.0, 123.0], 1.0)
    assert t.shape == (1, out.shape[0], out.shape[1], 3)
    mv = np.zeros((H, W, 2), np.float32)
    res = np.zeros((H, W, 3), np.float32)
    mv_t, res_t = transform_mv_res(mv, res, scale, [103.0, 116.0, 123.0])
    assert mv_t.shape[-1] == 2 and res_t.shape[-1] == 3
    assert mv_t.shape[1] == int(np.ceil(out.shape[0] / 16))


def test_train_loader_batches(mini_dataset):
    root, dpath, vid_dir = mini_dataset
    cfg = get_default_config()
    cfg.SCALES = [(60, 104)]
    cfg.tpu.default_bucket = (64, 112)
    cfg.tpu.image_buckets = [(64, 112), (112, 64)]
    ds = ImageNetVID("VID_train_15frames", root, dpath)
    roidb = ds.gt_roidb(use_cache=False)
    for rec in roidb:
        rec["video_path"] = os.path.join(dpath, "Data", "VID",
                                         "mpeg4_snippets", vid_dir + ".mp4")
    loader = TrainLoader(roidb, cfg, batch_size=2, num_workers=1)
    batch = next(iter(loader))
    assert batch["data"].shape == (2, 64, 112, 3)
    assert batch["data_ref"].shape == (2, 64, 112, 3)
    assert batch["motion_vector"].shape == (2, 4, 7, 2)
    assert batch["res_diff"].shape == (2, 4, 7, 3)
    assert batch["gt_boxes"].shape == (2, 100, 5)
    assert batch["gt_valid"].sum() == 2
    assert np.isfinite(batch["data"]).all()


def test_train_loader_orientation_buckets(tmp_path):
    """ASPECT_GROUPING (dff_rfcn/core/loader.py:220-240): a mixed
    portrait/landscape roidb yields single-orientation batches, each padded
    to its own bucket — portrait samples no longer overflow the landscape
    bucket."""
    cfg = get_default_config()
    cfg.SCALES = [(60, 104)]
    cfg.tpu.image_buckets = [(64, 112), (112, 64)]
    rng = np.random.default_rng(5)
    roidb = []
    for i in range(8):
        h, w = (96, 128) if i % 2 == 0 else (128, 96)
        p = tmp_path / f"im{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8)).save(p)
        roidb.append({"image": str(p), "height": h, "width": w,
                      "boxes": np.asarray([[5.0, 5, 40, 40]], np.float32),
                      "gt_classes": np.asarray([1], np.int32),
                      "flipped": False})
    loader = TrainLoader(roidb, cfg, batch_size=2, num_workers=1, seed=1)
    shapes = sorted({b["data"].shape for b in loader})
    assert len(loader) == 4
    assert shapes == [(2, 64, 112, 3), (2, 112, 64, 3)]


def test_train_loader_missing_video_errors():
    """A video record without a readable stream must fail with a clear
    message, not a TypeError inside the native loader (ref asserts at
    lib/utils/image.py:130)."""
    if not coviar.available():
        pytest.skip("native loader not built")
    cfg = get_default_config()
    rec = {"image": "x.JPEG", "height": 96, "width": 128,
           "pattern": "x/%06d.JPEG", "frame_seg_id": 3, "frame_seg_len": 10,
           "video_path": None,
           "boxes": np.zeros((1, 4), np.float32),
           "gt_classes": np.asarray([1], np.int32), "flipped": False}
    from lsfa_tpu.data.loader import load_pair_sample
    with pytest.raises(FileNotFoundError, match="compressed stream"):
        load_pair_sample(rec, cfg, np.random.default_rng(0))


def test_test_loader_schedule(mini_dataset):
    root, dpath, vid_dir = mini_dataset
    cfg = get_default_config()
    cfg.SCALES = [(60, 104)]
    cfg.tpu.default_bucket = (64, 112)
    ds = ImageNetVID("VID_val_videos", root, dpath)
    roidb = ds.gt_roidb(use_cache=False)
    for rec in roidb:
        rec["video_path"] = os.path.join(dpath, "Data", "VID",
                                         "mpeg4_snippets", vid_dir + ".mp4")
    loader = EvalLoader(roidb, cfg)
    flags = [item["flag"] for item in loader]
    assert len(flags) == SEG_LEN
    assert flags[0] == 0
    assert flags[12] == 1
    assert all(f == 2 for i, f in enumerate(flags) if i % 12 != 0)


def test_pair_sample_eq_flag_semantics(mini_dataset):
    """get_pair_image contract: key frames (pos_id==0) train the key path
    (eq_flag=1, zero MV/residual); mid-GOP frames get the previous key as
    ref and carry real MV/residual (lib/utils/image.py:92-200)."""
    root, dpath, vid_dir = mini_dataset
    if not coviar.available():
        pytest.skip("native loader not built")
    cfg = get_default_config()
    cfg.SCALES = [(60, 104)]
    cfg.TRAIN.MIN_OFFSET = -9
    cfg.TRAIN.MAX_OFFSET = -9   # force ref != cur for mid-GOP frames
    from lsfa_tpu.data.loader import load_pair_sample

    video = os.path.join(dpath, "Data", "VID", "mpeg4_snippets",
                         vid_dir + ".mp4")
    base = {"height": 96, "width": 128, "pattern": "x/%06d.JPEG",
            "frame_seg_len": SEG_LEN, "video_path": video,
            "image": os.path.join(dpath, "Data", "VID", vid_dir, "000000.JPEG"),
            "boxes": np.asarray([[10.0, 10, 60, 50]], np.float32),
            "gt_classes": np.asarray([1], np.int32), "flipped": False}
    rng = np.random.default_rng(0)

    key_rec = dict(base, frame_seg_id=12)       # GOP key frame
    s = load_pair_sample(key_rec, cfg, rng)
    assert s["eq_flag"] == 1.0
    assert np.abs(s["motion_vector"]).sum() == 0

    mid_rec = dict(base, frame_seg_id=17)       # mid-GOP frame
    s = load_pair_sample(mid_rec, cfg, rng)
    assert s["eq_flag"] == 0.0
    # ref is the GOP key -> MV/residual are the real compressed-domain
    # tensors (nonzero for a moving synthetic clip)
    assert np.abs(s["motion_vector"]).sum() > 0 or np.abs(s["res_diff"]).sum() > 0
    # boxes scaled by im_scale
    assert s["gt_boxes"][0, 2] < 60


def test_train_loader_worker_error_propagates():
    """A loader-worker exception must surface in the main thread instead
    of hanging the epoch (workers die silently otherwise)."""
    if not coviar.available():
        pytest.skip("native loader not built")
    cfg = get_default_config()
    cfg.SCALES = [(60, 104)]
    cfg.tpu.image_buckets = [(64, 112)]
    roidb = [{"image": "x.JPEG", "height": 96, "width": 128,
              "pattern": "x/%06d.JPEG", "frame_seg_id": 3,
              "frame_seg_len": 10, "video_path": "/nonexistent/v.mp4",
              "boxes": np.zeros((1, 4), np.float32),
              "gt_classes": np.asarray([1], np.int32), "flipped": False}]
    loader = TrainLoader(roidb, cfg, batch_size=1, num_workers=1)
    with pytest.raises(FileNotFoundError, match="compressed stream"):
        next(iter(loader))
