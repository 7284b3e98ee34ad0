import numpy as np

from lsfa_tpu.eval import vid_eval, vid_ap
from lsfa_tpu.eval.vid_eval import adaptive_iou_threshold


def test_vid_ap_perfect():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert vid_ap(rec, prec) == 1.0


def test_vid_ap_half():
    # one TP then one FP over 1 gt: rec [1,1], prec [1, .5] -> AP 1.0
    assert vid_ap(np.array([1.0, 1.0]), np.array([1.0, 0.5])) == 1.0
    # one FP then one TP: rec [0,1], prec [0,.5] -> AP 0.5
    assert vid_ap(np.array([0.0, 1.0]), np.array([0.0, 0.5])) == 0.5


def test_adaptive_threshold_small_boxes_laxer():
    big = np.array([[0, 0, 199, 99]], np.float64)     # 200x100
    small = np.array([[0, 0, 9, 9]], np.float64)      # 10x10
    t_big = adaptive_iou_threshold(big)[0]
    t_small = adaptive_iou_threshold(small)[0]
    assert t_big == 0.5                                # capped at default
    assert t_small < 0.5
    np.testing.assert_allclose(t_small, 100.0 / 400.0)


def test_vid_eval_end_to_end():
    # 2 images, 2 classes; class 1: perfect detection; class 2: one miss
    annotations = {
        0: {"labels": np.array([1, 2]),
            "boxes": np.array([[10, 10, 60, 60], [100, 100, 180, 160]])},
        1: {"labels": np.array([2]),
            "boxes": np.array([[20, 30, 90, 110]])},
    }
    detections = {
        0: {"labels": np.array([1, 2]),
            "scores": np.array([0.9, 0.8]),
            "boxes": np.array([[11, 11, 59, 59], [101, 99, 178, 161]])},
        1: {"labels": np.array([2]),
            "scores": np.array([0.7]),
            "boxes": np.array([[400, 400, 450, 450]])},  # miss
    }
    ap = vid_eval(detections, annotations, num_classes=3)
    assert ap[0] == 1.0                 # class 1 perfect
    assert 0.4 < ap[1] < 0.6            # class 2: 1 TP of 2 gts, 1 FP


def test_vid_eval_duplicate_detection_is_fp():
    annotations = {0: {"labels": np.array([1]),
                       "boxes": np.array([[10, 10, 60, 60]])}}
    detections = {0: {"labels": np.array([1, 1]),
                      "scores": np.array([0.9, 0.8]),
                      "boxes": np.array([[10, 10, 60, 60], [12, 12, 61, 61]])}}
    ap = vid_eval(detections, annotations, num_classes=2)
    # second det can't claim the same gt -> FP; AP still 1.0 because the TP
    # comes first in confidence order
    assert ap[0] == 1.0
