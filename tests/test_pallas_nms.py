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


def test_pallas_fixpoint_exit_on_suppression_chain():
    """A deep neighbor-suppression chain (box i suppresses i+1 only):
    greedy keeps the evens. The even/odd sandwich grows its settled
    prefix ~2 ranks per sweep, so this needs ~n/2 sweeps — exercises the
    in-kernel while_loop deeply, and the fixpoint exit fires well under
    the n cap."""
    n = 128
    w, s = 21.0, 6.0          # IoU(i, i+1) = 15/27 > 0.5; IoU(i, i+2) = 9/33 < 0.5
    x1 = np.arange(n, dtype=np.float32) * s
    boxes = np.stack([x1, np.zeros(n, np.float32),
                      x1 + w - 1.0, np.full(n, 20.0, np.float32)], axis=1)
    valid = np.ones(n, bool)
    got = np.asarray(greedy_alive_pallas(jnp.asarray(boxes),
                                         jnp.asarray(valid), 0.5, n,
                                         interpret=True))
    want = np.zeros(n, bool)
    want[::2] = True
    np.testing.assert_array_equal(got, want)


def test_pallas_odd_cap_is_subset_of_greedy():
    """Hitting an odd sweep cap unconverged must yield a SUBSET of the
    greedy keeps (same soundness contract as the XLA path)."""
    n = 256
    boxes, scores = make_sorted(3, n)
    valid = np.ones(n, bool)
    got = np.asarray(greedy_alive_pallas(jnp.asarray(boxes),
                                         jnp.asarray(valid), 0.6, 1,
                                         interpret=True))
    keep = ref_nms(np.concatenate([boxes, scores[:, None]], 1), 0.6)
    full = np.zeros(n, bool)
    full[keep] = True
    assert not (got & ~full).any(), "odd-cap emitted a non-greedy keep"


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
