import numpy as np
import jax.numpy as jnp

from lsfa_tpu.train import ohem_select, proposal_target
from tests.ref_impl import ref_iou_matrix


def test_proposal_target_labels_and_targets():
    rois = np.array([
        [0, 10, 10, 50, 50],     # overlaps gt0 heavily
        [0, 200, 200, 240, 240], # background
        [0, 12, 8, 48, 52],      # overlaps gt0
    ], np.float32)
    gt = np.zeros((4, 5), np.float32)
    gt[0] = [10, 10, 50, 50, 5]
    gt_valid = np.zeros(4, bool)
    gt_valid[0] = True

    out = proposal_target(jnp.asarray(rois), jnp.asarray(gt), jnp.asarray(gt_valid))
    lab = np.asarray(out["label"])
    assert out["rois"].shape == (7, 5)
    # roi0 fg with class 5; roi1 bg; appended gt0 fg; padded gt slots -1
    assert lab[0] == 5 and lab[1] == 0 and lab[3] == 5
    assert (lab[4:] == -1).all()
    # fg weights in the class-agnostic slot [4:8]
    w = np.asarray(out["bbox_weight"])
    assert (w[0, 4:8] == 1).all() and (w[0, :4] == 0).all()
    assert (w[1] == 0).all()
    # appended gt roi has ~zero regression target (it IS the gt)
    t = np.asarray(out["bbox_target"])
    np.testing.assert_allclose(t[3, 4:8], 0.0, atol=1e-5)
    # IoU sanity vs oracle
    iou = ref_iou_matrix(rois[:, 1:], gt[:1, :4])
    assert (iou[0, 0] >= 0.5) == (lab[0] > 0)


def test_ohem_keeps_topk_losses():
    rng = np.random.default_rng(0)
    n, c = 20, 6
    logits = rng.normal(size=(n, c)).astype(np.float32)
    labels = rng.integers(0, c, n).astype(np.float32)
    deltas = rng.normal(size=(n, 8)).astype(np.float32)
    targets = rng.normal(size=(n, 8)).astype(np.float32)
    weights = np.zeros((n, 8), np.float32)
    weights[:, 4:] = 1.0
    valid = np.ones(n, bool)
    valid[-3:] = False

    lab, w = ohem_select(jnp.asarray(logits), jnp.asarray(deltas),
                         jnp.asarray(labels), jnp.asarray(targets),
                         jnp.asarray(weights), jnp.asarray(valid), roi_per_img=5)
    lab, w = np.asarray(lab), np.asarray(w)
    kept = lab >= 0
    assert kept.sum() == 5
    assert not kept[-3:].any()  # invalid rois never kept
    # oracle: top-5 by CE + weighted smooth-l1 among valid
    z = logits - logits.max(axis=1, keepdims=True)
    ce = -(z[np.arange(n), labels.astype(int)] - np.log(np.exp(z).sum(axis=1)))
    d = deltas - targets
    sl1 = np.where(np.abs(d) < 1, 0.5 * d * d, np.abs(d) - 0.5)
    loss = ce + (weights * sl1).sum(axis=1)
    loss[~valid] = -np.inf
    want = set(np.argsort(-loss, kind="stable")[:5])
    assert set(np.where(kept)[0]) == want
    assert (w[~kept] == 0).all()
