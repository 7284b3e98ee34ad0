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


def test_shard_videos_balances_by_frames():
    roidb = [{"frame_seg_len": n} for n in (100, 50, 50, 10)]
    shards = shard_videos(roidb, 2)
    loads = [sum(r["frame_seg_len"] for r in s) for s in shards]
    assert abs(loads[0] - loads[1]) <= 10


def test_eval_driver_end_to_end(eval_env, tmp_path):
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
    model, params, bs = init_model(cfg)
    variables = {"params": params, "batch_stats": bs}
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
