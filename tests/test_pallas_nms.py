"""Pallas fused-NMS kernel vs the XLA path and the greedy oracle
(interpret mode on CPU; compiled on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from lsfa_tpu.ops.nms import _greedy_alive
from lsfa_tpu.ops.pallas_nms import greedy_alive_pallas
from tests.ref_impl import ref_nms
from tests.test_boxes import rand_boxes


def make_sorted(seed, n):
    rng = np.random.default_rng(seed)
    boxes = rand_boxes(rng, n, hi=400)
    scores = np.sort(rng.uniform(0.01, 1.0, n).astype(np.float32))[::-1].copy()
    return boxes, scores


def test_pallas_matches_xla_sweeps():
    n = 256
    boxes, scores = make_sorted(0, n)
    valid = np.ones(n, bool)
    want = np.asarray(_greedy_alive(jnp.asarray(boxes), jnp.asarray(valid),
                                    0.5, 16))
    got = np.asarray(greedy_alive_pallas(jnp.asarray(boxes),
                                         jnp.asarray(valid), 0.5, 16,
                                         interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_matches_greedy_oracle():
    n = 512
    boxes, scores = make_sorted(1, n)
    valid = np.ones(n, bool)
    got = np.asarray(greedy_alive_pallas(jnp.asarray(boxes),
                                         jnp.asarray(valid), 0.7, 24,
                                         interpret=True))
    keep = ref_nms(np.concatenate([boxes, scores[:, None]], 1), 0.7)
    want = np.zeros(n, bool)
    want[keep] = True
    np.testing.assert_array_equal(got, want)


def test_pallas_respects_valid_mask():
    n = 256
    boxes, scores = make_sorted(2, n)
    valid = np.ones(n, bool)
    valid[100:] = False
    got = np.asarray(greedy_alive_pallas(jnp.asarray(boxes),
                                         jnp.asarray(valid), 0.5, 16,
                                         interpret=True))
    assert not got[100:].any()
    want = np.asarray(_greedy_alive(jnp.asarray(boxes), jnp.asarray(valid),
                                    0.5, 16))
    np.testing.assert_array_equal(got, want)
