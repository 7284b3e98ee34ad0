import numpy as np
import jax.numpy as jnp

from lsfa_tpu.ops import nms_fixed
from tests.ref_impl import ref_nms
from tests.test_boxes import rand_boxes


def run_case(seed, n, thresh, max_out):
    rng = np.random.default_rng(seed)
    boxes = rand_boxes(rng, n, hi=120)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    keep_idx, keep_valid = nms_fixed(
        jnp.asarray(boxes), jnp.asarray(scores), thresh, max_out)
    got = np.asarray(keep_idx)[np.asarray(keep_valid)]
    want = ref_nms(np.concatenate([boxes, scores[:, None]], axis=1), thresh)
    want = want[:max_out]
    np.testing.assert_array_equal(got, want)


def test_nms_small():
    run_case(0, 30, 0.5, 10)


def test_nms_medium_dense():
    # densely overlapping boxes exercise long suppression chains
    run_case(1, 200, 0.7, 50)


def test_nms_loose_threshold():
    run_case(2, 150, 0.3, 300)


def test_nms_with_invalid_entries():
    rng = np.random.default_rng(3)
    boxes = rand_boxes(rng, 40, hi=100)
    scores = rng.uniform(0.01, 1.0, 40).astype(np.float32)
    valid = np.ones(40, dtype=bool)
    valid[25:] = False
    keep_idx, keep_valid = nms_fixed(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, 20,
        valid=jnp.asarray(valid))
    got = np.asarray(keep_idx)[np.asarray(keep_valid)]
    want = ref_nms(np.concatenate([boxes[:25], scores[:25, None]], axis=1), 0.5)[:20]
    np.testing.assert_array_equal(got, want)
    assert all(i < 25 for i in got)


def test_nms_padding_repeats_last():
    boxes = jnp.asarray([[0.0, 0, 10, 10], [100, 100, 110, 110]])
    scores = jnp.asarray([0.9, 0.8])
    keep_idx, keep_valid = nms_fixed(boxes, scores, 0.5, 5)
    assert list(np.asarray(keep_valid)) == [True, True, False, False, False]
    assert list(np.asarray(keep_idx)[:2]) == [0, 1]
