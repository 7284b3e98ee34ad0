"""End-to-end train driver smoke: loader -> sharded train step -> checkpoint.

Exercises the full train_net path (the reference train_end2end.main role)
on a synthesized miniature dataset."""

import os

import numpy as np
import pytest
from PIL import Image

from lsfa_tpu.config import load_config
from lsfa_tpu.data import coviar
from tests.test_data_pipeline import write_xml

W, H = 128, 96
SEG_LEN = 24


@pytest.fixture(scope="module")
def tiny_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("tinytrain")
    dpath = root / "ILSVRC2015"
    vid_dir = "train/vid_t"
    iset = dpath / "ImageSets"
    os.makedirs(iset)
    with open(iset / "VID_train_15frames.txt", "w") as f:
        for fid in (3, 9):
            f.write(f"{vid_dir} 1 {fid} {SEG_LEN}\n")
    for fid in range(SEG_LEN):
        img = np.full((H, W, 3), 60, np.uint8)
        img[20:60, 30:90] = 200
        p = dpath / "Data" / "VID" / vid_dir / f"{fid:06d}.JPEG"
        os.makedirs(os.path.dirname(p), exist_ok=True)
        Image.fromarray(img).save(p)
        write_xml(str(dpath / "Annotations" / "VID" / vid_dir / f"{fid:06d}.xml"),
                  W, H, [("n02691156", 30, 20, 90, 60)])
    if coviar.available():
        vp = dpath / "Data" / "VID" / "mpeg4_snippets" / (vid_dir + ".mp4")
        os.makedirs(os.path.dirname(vp), exist_ok=True)
        coviar.encode_test_video(str(vp), n_frames=SEG_LEN, w=W, h=H,
                                 gop_size=12, seed=7)
    return str(root), str(dpath), vid_dir


def test_train_net_two_steps_and_checkpoint(tiny_env, tmp_path):
    root, dpath, vid_dir = tiny_env
    cfg = load_config("configs/lsfa_tiny_smoke.yaml")
    cfg.dataset.root_path = root
    cfg.dataset.dataset_path = dpath
    cfg.TRAIN.FLIP = False
    # lighter detection shapes for speed
    cfg.TRAIN.RPN_PRE_NMS_TOP_N = 128
    cfg.TRAIN.RPN_POST_NMS_TOP_N = 32
    cfg.TRAIN.BATCH_ROIS_OHEM = 16
    cfg.tpu.max_gt_boxes = 8

    from lsfa_tpu.data.dataset import ImageNetVID
    from lsfa_tpu.train.driver import train_net

    ds = ImageNetVID("VID_train_15frames", root, dpath)
    roidb = ds.gt_roidb(use_cache=False)
    for rec in roidb:
        rec["video_path"] = os.path.join(dpath, "Data", "VID",
                                         "mpeg4_snippets", vid_dir + ".mp4")

    ckpt = str(tmp_path / "ckpt")
    import logging
    logger = logging.getLogger("tiny_train")
    logger.addHandler(logging.NullHandler())
    params, batch_stats = train_net(cfg, roidb=roidb, ckpt_dir=ckpt,
                                    logger=logger, max_steps=2)
    assert params is not None
    # a checkpoint exists and restores
    from lsfa_tpu.train.checkpoint import load_checkpoint
    restored, step = load_checkpoint(ckpt)
    assert "params" in restored


def test_rfcn_train_net_smoke(tiny_env, tmp_path):
    """The single-frame R-FCN baseline must train through the same driver
    (the reference's rfcn/train_end2end.py role)."""
    root, dpath, vid_dir = tiny_env
    cfg = load_config("configs/rfcn_tiny_smoke.yaml")
    cfg.dataset.root_path = root
    cfg.dataset.dataset_path = dpath
    cfg.TRAIN.FLIP = False
    cfg.TRAIN.RPN_PRE_NMS_TOP_N = 128
    cfg.TRAIN.RPN_POST_NMS_TOP_N = 32
    cfg.TRAIN.BATCH_ROIS_OHEM = 16
    cfg.tpu.max_gt_boxes = 8

    from lsfa_tpu.data.dataset import ImageNetVID
    from lsfa_tpu.train.driver import train_net

    ds = ImageNetVID("VID_train_15frames", root, dpath)
    roidb = ds.gt_roidb(use_cache=False)

    import logging
    logger = logging.getLogger("tiny_rfcn")
    logger.addHandler(logging.NullHandler())
    params, batch_stats = train_net(cfg, roidb=roidb,
                                    ckpt_dir=str(tmp_path / "ck"),
                                    logger=logger, max_steps=2)
    assert "rfcn_cls" in params and "flownet" not in params


def test_init_model_loads_mxnet_pretrained(tmp_path):
    """init_model must pick up cfg.network.pretrained .params files (the
    reference's load_param + combine init, train_end2end.py:107-115) and
    land the tensors on the flax tree exactly."""
    import numpy as np
    import jax

    from lsfa_tpu.train.driver import init_model
    from lsfa_tpu.train.import_mxnet import export_mxnet_lsfa

    cfg = load_config("configs/lsfa_tiny_smoke.yaml")
    # build a donor variable tree with the same architecture, seeded
    # differently, export it as the "pretrained" checkpoint
    cfg.network.pretrained = ""
    model, params0, bs0 = init_model(cfg, rng_seed=123)
    donor = {"params": params0, "batch_stats": bs0}
    path = tmp_path / "resnet-tiny-0000.params"
    export_mxnet_lsfa(donor, str(path))

    cfg2 = load_config("configs/lsfa_tiny_smoke.yaml")
    cfg2.network.pretrained = str(path)     # full filename form
    _, params1, bs1 = init_model(cfg2, rng_seed=0)

    # backbone + flownet tensors must equal the donor's (not the seed-0 init)
    np.testing.assert_allclose(
        np.asarray(params1["backbone"]["conv0"]["kernel"]),
        np.asarray(params0["backbone"]["conv0"]["kernel"]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params1["flownet"]["conv3_1"]["kernel"]),
        np.asarray(params0["flownet"]["conv3_1"]["kernel"]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(bs1["backbone"]["bn0"]["BatchNorm_0"]["mean"]),
        np.asarray(bs0["backbone"]["bn0"]["BatchNorm_0"]["mean"]), atol=1e-6)
    # small net was re-seeded FROM the imported backbone (init_weight)
    np.testing.assert_allclose(
        np.asarray(params1["small_net_backbone"]["conv0"]["kernel"]),
        np.asarray(params0["backbone"]["conv0"]["kernel"]), atol=1e-6)
