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


def test_sample_rois_fixed_semantics():
    """BATCH_ROIS > 0 fg/bg sampling (core/rcnn.py:126-191): fg capped at
    round(fg_fraction*batch_rois), bg drawn from the IoU band, gap-filled;
    every non-fg slot labeled 0 with zero bbox weight."""
    import jax
    from lsfa_tpu.train.proposal_target import sample_rois_fixed

    rng = np.random.default_rng(0)
    n, g = 80, 4
    rois = np.concatenate(
        [np.zeros((n, 1), np.float32),
         np.sort(rng.uniform(0, 100, (n, 2, 2)).astype(np.float32),
                 axis=1).reshape(n, 4)[:, [0, 2, 1, 3]]], axis=1)
    gt = np.concatenate(
        [np.sort(rng.uniform(0, 100, (g, 2, 2)).astype(np.float32),
                 axis=1).reshape(g, 4)[:, [0, 2, 1, 3]],
         rng.integers(1, 5, (g, 1)).astype(np.float32)], axis=1)
    # plant guaranteed fg rois: copies of gt
    rois[:g, 1:5] = gt[:, :4]
    gtv = np.ones(g, bool)
    tgt = proposal_target(jnp.asarray(rois), jnp.asarray(gt),
                          jnp.asarray(gtv))
    batch_rois, fg_frac = 32, 0.25
    out = sample_rois_fixed(tgt, jax.random.PRNGKey(1),
                            batch_rois=batch_rois, fg_fraction=fg_frac)
    lab = np.asarray(out["label"])
    assert lab.shape == (batch_rois,)
    assert np.asarray(out["valid"]).all()
    fg_n = int(round(fg_frac * batch_rois))
    n_fg_avail = int(np.sum(np.asarray(tgt["label"]) > 0))
    n_fg = int(np.sum(lab > 0))
    assert n_fg == min(fg_n, n_fg_avail)
    # fg slots are a prefix; all fg labels are real gt classes
    assert (lab[:n_fg] > 0).all() and (lab[n_fg:] == 0).all()
    # bg/gap slots carry no regression signal
    bw = np.asarray(out["bbox_weight"])
    assert (bw[n_fg:] == 0).all() and (bw[:n_fg, 4:8] == 1).all()
    # every selected roi exists in the input set
    sel = np.asarray(out["rois"])
    all_in = np.asarray(tgt["rois"])
    for r in sel:
        assert (np.abs(all_in - r).sum(axis=1) < 1e-5).any()
    # bg slots really come from the [lo, hi) IoU band (or are gap fills
    # labeled 0) — check none of them is a high-IoU roi still labeled fg
    assert not ((lab == 0) & (np.asarray(out["bbox_weight"])[:, 4] > 0)).any()


def test_ohem_underfull_ignores_padding():
    """Fewer eligible rois than roi_per_img: padding/invalid rois must
    stay label -1 / zero weight (a kth=-inf threshold would admit them)."""
    import jax
    n, c = 12, 5
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(0, 1, (n, c)).astype(np.float32))
    deltas = jnp.zeros((n, 8))
    labels = jnp.asarray(
        np.array([1, 2, 0] + [3] * 9, np.float32))
    targets = jnp.zeros((n, 8))
    weights = jnp.ones((n, 8))
    valid = jnp.asarray(np.array([True] * 3 + [False] * 9))
    lab, w = ohem_select(logits, deltas, labels, targets, weights, valid,
                         roi_per_img=8)
    lab = np.asarray(lab)
    w = np.asarray(w)
    assert (lab[3:] == -1).all(), "invalid rois leaked into OHEM keep-set"
    assert (w[3:] == 0).all()
    assert (lab[:3] >= 0).all()   # all eligible rois kept (< roi_per_img)


def test_proposal_target_per_class_expansion():
    """CLASS_AGNOSTIC=false: targets land in the roi's CLASS slot
    (lib/bbox/bbox_regression.py:120-141 expand_bbox_regression_targets:
    start = 4*cls), and width is 4*num_classes."""
    rois = np.array([
        [0, 10, 10, 50, 50],      # fg, class 5
        [0, 200, 200, 240, 240],  # bg
    ], np.float32)
    gt = np.zeros((2, 5), np.float32)
    gt[0] = [10, 10, 50, 50, 5]
    gt_valid = np.array([True, False])

    num_cls = 7
    out = proposal_target(jnp.asarray(rois), jnp.asarray(gt),
                          jnp.asarray(gt_valid), num_reg_classes=num_cls)
    t = np.asarray(out["bbox_target"])
    w = np.asarray(out["bbox_weight"])
    assert t.shape == (4, 4 * num_cls) and w.shape == (4, 4 * num_cls)
    # fg roi0 (class 5): only slot 5 carries weight
    assert (w[0, 20:24] == 1).all()
    w0 = w[0].copy(); w0[20:24] = 0
    assert (w0 == 0).all()
    # bg roi1: no regression anywhere
    assert (w[1] == 0).all()
    # the appended gt roi (index 2) regresses to itself in slot 5
    np.testing.assert_allclose(t[2, 20:24],
                               (-np.array([0, 0, 0, 0])
                                - np.array([0, 0, 0, 0])), atol=1e-5)
    # agnostic (default) and per-class agree on the fg slot CONTENT
    out2 = proposal_target(jnp.asarray(rois), jnp.asarray(gt),
                           jnp.asarray(gt_valid))
    np.testing.assert_allclose(t[0, 20:24],
                               np.asarray(out2["bbox_target"])[0, 4:8],
                               atol=1e-6)


def test_proposal_target_normalization_gate():
    """TRAIN.BBOX_NORMALIZATION_PRECOMPUTED=false skips the mean/std
    normalization of regression targets (core/rcnn.py:183-186)."""
    rois = np.array([[0, 10, 10, 50, 50]], np.float32)
    gt = np.zeros((1, 5), np.float32)
    gt[0] = [12, 8, 54, 50, 2]
    gt_valid = np.array([True])
    stds = (0.1, 0.1, 0.2, 0.2)

    norm = proposal_target(jnp.asarray(rois), jnp.asarray(gt),
                           jnp.asarray(gt_valid), bbox_stds=stds)
    raw = proposal_target(jnp.asarray(rois), jnp.asarray(gt),
                          jnp.asarray(gt_valid), bbox_stds=stds,
                          normalization_precomputed=False)
    tn = np.asarray(norm["bbox_target"])[0, 4:8]
    tr = np.asarray(raw["bbox_target"])[0, 4:8]
    np.testing.assert_allclose(tn * np.asarray(stds), tr, rtol=1e-5)


def test_proposal_target_degenerate_roi_no_nan():
    """An inverted roi (decoded from an extreme RPN delta: height < 1 so
    y2 < y1) makes bbox_transform emit nan/inf; proposal_target must keep
    it out of bbox_target entirely (0 * nan = nan would otherwise reach
    the train loss — round-3 regression caught by bench_train)."""
    rois = np.array([
        [0, 10, 10, 50, 50],            # fg
        [0, 0.0, 28.9, 95.0, 27.9],     # degenerate: y2 < y1
    ], np.float32)
    gt = np.zeros((2, 5), np.float32)
    gt[0] = [10, 10, 50, 50, 3]
    gt_valid = np.array([True, False])
    out = proposal_target(jnp.asarray(rois), jnp.asarray(gt),
                          jnp.asarray(gt_valid))
    t = np.asarray(out["bbox_target"])
    assert np.isfinite(t).all(), t
    # per-class expansion path too
    out2 = proposal_target(jnp.asarray(rois), jnp.asarray(gt),
                           jnp.asarray(gt_valid), num_reg_classes=7)
    assert np.isfinite(np.asarray(out2["bbox_target"])).all()
