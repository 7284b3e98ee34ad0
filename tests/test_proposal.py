import numpy as np
import jax.numpy as jnp

from lsfa_tpu.ops import rpn_proposals
from lsfa_tpu.ops.anchors import anchor_grid
from tests.ref_impl import ref_bbox_pred, ref_nms


def ref_proposals(fg_hwA, deltas_hwA4, anchors, im_info, pre_n, post_n,
                  thresh, min_size, stride=16):
    """NumPy oracle mirroring dff_rfcn/operator_py/proposal.py:51-168."""
    h, w, a = fg_hwA.shape
    real_h, real_w = int(im_info[0] / stride), int(im_info[1] / stride)
    # crop to the real extent, flatten (h, w, a)
    scores = fg_hwA[:real_h, :real_w].reshape(-1)
    deltas = deltas_hwA4[:real_h, :real_w].reshape(-1, 4)
    anc = anchors.reshape(h, w, a, 4)[:real_h, :real_w].reshape(-1, 4)
    props = ref_bbox_pred(anc, deltas)
    props[:, 0::4] = np.clip(props[:, 0::4], 0, im_info[1] - 1)
    props[:, 1::4] = np.clip(props[:, 1::4], 0, im_info[0] - 1)
    props[:, 2::4] = np.clip(props[:, 2::4], 0, im_info[1] - 1)
    props[:, 3::4] = np.clip(props[:, 3::4], 0, im_info[0] - 1)
    ws = props[:, 2] - props[:, 0] + 1
    hs = props[:, 3] - props[:, 1] + 1
    keep = np.where((ws >= min_size * im_info[2]) & (hs >= min_size * im_info[2]))[0]
    props, scores = props[keep], scores[keep]
    order = np.argsort(-scores, kind="stable")[:pre_n]
    props, scores = props[order], scores[order]
    keep = ref_nms(np.concatenate([props, scores[:, None]], axis=1), thresh)[:post_n]
    return props[keep], scores[keep]


def test_rpn_proposals_match_reference_oracle():
    rng = np.random.default_rng(0)
    h, w, a = 12, 16, 9
    anchors = anchor_grid(h, w, 16)
    fg = rng.uniform(0, 1, (h, w, a)).astype(np.float32)
    deltas = rng.normal(0, 0.2, (h, w, a * 4)).astype(np.float32)
    im_info = np.array([h * 16 - 7, w * 16 - 12, 1.5], np.float32)  # unpadded extent

    rois, scores, valid = rpn_proposals(
        jnp.asarray(fg), jnp.asarray(deltas), jnp.asarray(anchors),
        jnp.asarray(im_info), pre_nms_top_n=600, post_nms_top_n=80,
        nms_thresh=0.7, min_size=16)
    got_boxes = np.asarray(rois)[np.asarray(valid), 1:]
    got_scores = np.asarray(scores)[np.asarray(valid)]

    want_boxes, want_scores = ref_proposals(
        fg, deltas.reshape(h, w, a, 4), anchors.reshape(-1, 4),
        im_info, 600, 80, 0.7, 16)
    assert got_boxes.shape == want_boxes.shape
    np.testing.assert_allclose(got_scores, want_scores, rtol=1e-5)
    np.testing.assert_allclose(got_boxes, want_boxes, rtol=1e-4, atol=1e-3)


def test_rpn_proposals_fixed_output_shape():
    rng = np.random.default_rng(1)
    h, w, a = 8, 8, 9
    anchors = anchor_grid(h, w, 16)
    fg = rng.uniform(0, 1, (h, w, a)).astype(np.float32)
    deltas = rng.normal(0, 0.2, (h, w, a * 4)).astype(np.float32)
    im_info = np.array([h * 16, w * 16, 1.0], np.float32)
    rois, scores, valid = rpn_proposals(
        jnp.asarray(fg), jnp.asarray(deltas), jnp.asarray(anchors),
        jnp.asarray(im_info), pre_nms_top_n=200, post_nms_top_n=300)
    assert rois.shape == (300, 5)
    assert scores.shape == (300,)
    # padded slots hold a repeat of the last kept roi (never garbage)
    nvalid = int(np.asarray(valid).sum())
    if nvalid < 300:
        pad = np.asarray(rois)[nvalid:]
        np.testing.assert_allclose(
            pad, np.tile(np.asarray(rois)[nvalid - 1], (len(pad), 1)))


def test_nms_tier_exact_when_enough_keeps():
    """Tiered RPN NMS must equal the full run whenever the tier yields
    >= post_nms keeps (prefix-greedy property)."""
    rng = np.random.default_rng(5)
    h, w, a = 12, 16, 9
    anchors = anchor_grid(h, w, 16)
    fg = rng.uniform(0, 1, (h, w, a)).astype(np.float32)
    deltas = rng.normal(0, 0.2, (h, w, a * 4)).astype(np.float32)
    im_info = np.array([h * 16.0, w * 16.0, 1.0], np.float32)
    full = rpn_proposals(jnp.asarray(fg), jnp.asarray(deltas),
                         jnp.asarray(anchors), jnp.asarray(im_info),
                         pre_nms_top_n=1000, post_nms_top_n=60,
                         nms_thresh=0.7)
    tier = rpn_proposals(jnp.asarray(fg), jnp.asarray(deltas),
                         jnp.asarray(anchors), jnp.asarray(im_info),
                         pre_nms_top_n=1000, post_nms_top_n=60,
                         nms_thresh=0.7, nms_tier=512)
    n_tier = int(np.asarray(tier[2]).sum())
    if n_tier >= 60:
        np.testing.assert_allclose(np.asarray(tier[0]), np.asarray(full[0]),
                                   rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(tier[2]),
                                      np.asarray(full[2]))


def test_iou_loss_decode_matches_additive_oracle():
    """iou_loss mode (multi_proposal-inl.h:152-156): deltas are per-corner
    additive offsets, not center/log-size transforms."""
    rng = np.random.default_rng(3)
    h, w, a = 8, 10, 9
    anchors = anchor_grid(h, w, 16)
    fg = rng.uniform(0, 1, (h, w, a)).astype(np.float32)
    deltas = rng.normal(0, 4.0, (h, w, a * 4)).astype(np.float32)
    im_info = np.array([h * 16, w * 16, 1.0], np.float32)

    rois, scores, valid = rpn_proposals(
        jnp.asarray(fg), jnp.asarray(deltas), jnp.asarray(anchors),
        jnp.asarray(im_info), pre_nms_top_n=400, post_nms_top_n=50,
        nms_thresh=0.7, min_size=0, iou_loss=True)
    got_boxes = np.asarray(rois)[np.asarray(valid), 1:]
    got_scores = np.asarray(scores)[np.asarray(valid)]

    # oracle: additive decode + clip + sort + greedy NMS
    props = anchors.reshape(-1, 4) + deltas.reshape(-1, 4)
    props[:, 0::2] = np.clip(props[:, 0::2], 0, im_info[1] - 1)
    props[:, 1::2] = np.clip(props[:, 1::2], 0, im_info[0] - 1)
    scores_f = fg.reshape(-1)
    order = np.argsort(-scores_f, kind="stable")[:400]
    props, scores_f = props[order], scores_f[order]
    keep = ref_nms(np.concatenate([props, scores_f[:, None]], 1), 0.7)[:50]
    np.testing.assert_allclose(got_scores, scores_f[keep], rtol=1e-5)
    np.testing.assert_allclose(got_boxes, props[keep], rtol=1e-4, atol=1e-3)
