import numpy as np
import jax.numpy as jnp

from lsfa_tpu.ops import bbox_pred, bbox_transform, clip_boxes, pairwise_iou
from lsfa_tpu.ops.anchors import generate_anchors, anchor_grid
from tests.ref_impl import ref_bbox_pred, ref_iou_matrix


def rand_boxes(rng, n, lo=0, hi=200):
    x1 = rng.uniform(lo, hi, n)
    y1 = rng.uniform(lo, hi, n)
    w = rng.uniform(1, 80, n)
    h = rng.uniform(1, 80, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)


def test_bbox_pred_matches_reference():
    rng = np.random.default_rng(0)
    boxes = rand_boxes(rng, 64)
    deltas = rng.normal(0, 0.3, (64, 8)).astype(np.float32)
    got = np.asarray(bbox_pred(jnp.asarray(boxes), jnp.asarray(deltas)))
    want = ref_bbox_pred(boxes, deltas)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_bbox_transform_roundtrip():
    rng = np.random.default_rng(1)
    ex = rand_boxes(rng, 32)
    gt = rand_boxes(rng, 32)
    t = bbox_transform(jnp.asarray(ex), jnp.asarray(gt))
    back = bbox_pred(jnp.asarray(ex), t.reshape(32, 4))
    np.testing.assert_allclose(np.asarray(back), gt, rtol=1e-3, atol=1e-2)


def test_clip_boxes():
    boxes = jnp.asarray([[-5.0, -3.0, 250.0, 180.0], [10.0, 10.0, 20.0, 20.0]])
    out = np.asarray(clip_boxes(boxes, (100, 200)))
    np.testing.assert_allclose(out[0], [0, 0, 199, 99])
    np.testing.assert_allclose(out[1], [10, 10, 20, 20])


def test_pairwise_iou_matches_reference():
    rng = np.random.default_rng(2)
    a = rand_boxes(rng, 20)
    b = rand_boxes(rng, 15)
    got = np.asarray(pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
    want = ref_iou_matrix(a, b)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_generate_anchors_known_values():
    # classic Faster-R-CNN anchors for base 16, ratios (0.5,1,2), scales (8,16,32)
    a = generate_anchors(16, (0.5, 1, 2), (8, 16, 32))
    assert a.shape == (9, 4)
    # ratio 1, scale 8 anchor is the centered 128x128 box
    np.testing.assert_allclose(a[3], [-56, -56, 71, 71])
    # widths/heights: ratio 0.5 -> w=23*scale (rounded sqrt(512)=23)
    w = a[:, 2] - a[:, 0] + 1
    h = a[:, 3] - a[:, 1] + 1
    np.testing.assert_allclose(w[:3], [184, 368, 736])
    np.testing.assert_allclose(h[:3], [96, 192, 384])
    # all centered on (7.5, 7.5)
    np.testing.assert_allclose((a[:, 0] + a[:, 2]) / 2, 7.5)


def test_anchor_grid_order():
    g = anchor_grid(2, 3, stride=16)
    assert g.shape == (2 * 3 * 9, 4)
    base = generate_anchors(16)
    # entry (h=1, w=2, a=4) should be base[4] shifted by (32, 16)
    idx = (1 * 3 + 2) * 9 + 4
    np.testing.assert_allclose(g[idx], base[4] + np.array([32, 16, 32, 16]))
