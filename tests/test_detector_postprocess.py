"""postprocess_detections: class-agnostic vs per-class regression decode
(the CLASS_AGNOSTIC knob — resnet_v1_101_flownet_rfcn.py:281 and the
tester's bbox_pred over (R, 4*num_reg_classes) deltas)."""

import numpy as np
import jax.numpy as jnp

from lsfa_tpu.eval.detector import postprocess_detections
from lsfa_tpu.ops.boxes import bbox_pred

STDS = (0.1, 0.1, 0.2, 0.2)


def _setup(num_reg):
    rois = np.array([
        [0, 10.0, 10.0, 50.0, 50.0],
        [0, 100.0, 100.0, 160.0, 180.0],
    ], np.float32)
    r = rois.shape[0]
    rng = np.random.default_rng(3)
    deltas = rng.normal(0, 1.0, (r, num_reg, 4)).astype(np.float32)
    deltas[:, 0] = 0.0                        # bg slot unused
    cls_prob = np.array([
        [0.05, 0.90, 0.05],                   # roi0 -> class 1
        [0.05, 0.05, 0.90],                   # roi1 -> class 2
    ], np.float32)
    return rois, deltas, cls_prob


def _run(rois, deltas, cls_prob, num_reg):
    im_info = jnp.asarray([200.0, 200.0, 1.0])
    dets, valid = postprocess_detections(
        jnp.asarray(cls_prob), jnp.asarray(deltas.reshape(len(rois), -1)),
        jnp.asarray(rois), jnp.ones((len(rois),), bool), im_info,
        num_classes=3, max_per_image=8, score_thresh=0.1,
        bbox_stds=STDS, num_reg_classes=num_reg)
    return np.asarray(dets), np.asarray(valid)


def test_per_class_slots_drive_the_boxes():
    num_reg = 3
    rois, deltas, cls_prob = _setup(num_reg)
    dets, valid = _run(rois, deltas, cls_prob, num_reg)
    got = {int(d[0]): d[2:6] for d, v in zip(dets, valid) if v}
    assert set(got) == {1, 2}
    for roi_i, cls in ((0, 1), (1, 2)):
        want = np.asarray(bbox_pred(
            jnp.asarray(rois[roi_i:roi_i + 1, 1:5]),
            jnp.asarray(deltas[roi_i:roi_i + 1, cls] * np.asarray(STDS))))[0]
        np.testing.assert_allclose(got[cls], want, rtol=1e-4, atol=1e-3)


def test_agnostic_uses_slot1_for_every_class():
    rois, deltas, cls_prob = _setup(2)
    dets, valid = _run(rois, deltas, cls_prob, 2)
    got = {int(d[0]): d[2:6] for d, v in zip(dets, valid) if v}
    for roi_i, cls in ((0, 1), (1, 2)):
        want = np.asarray(bbox_pred(
            jnp.asarray(rois[roi_i:roi_i + 1, 1:5]),
            jnp.asarray(deltas[roi_i:roi_i + 1, 1] * np.asarray(STDS))))[0]
        np.testing.assert_allclose(got[cls], want, rtol=1e-4, atol=1e-3)
