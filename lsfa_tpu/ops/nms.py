"""Fixed-shape greedy NMS for TPU.

Exactly reproduces greedy hard-NMS (parity target: the pure-NumPy oracle
at lib/nms/nms.py:37-74) but as a fixed-shape, jit-compatible program:

  1. sort boxes by score (descending, stable),
  2. build the strict-upper-triangular suppression mask
     sup[i, j] = (i < j) & (IoU(i, j) > thresh),
  3. iterate  alive <- valid & ~(aliveᵀ · sup)  to fixpoint.

Step 3 is the classic iterated-suppression formulation: starting from
alive = valid, each sweep re-derives which boxes are suppressed by a
*currently alive* higher-scored box. The fixpoint equals the greedy NMS
keep-set, and is reached in at most (longest suppression chain) sweeps —
typically < 10. Each sweep is one (N,) x (N, N) matmul, which maps onto
the MXU instead of the data-dependent scan a sequential greedy loop would
need. This replaces both the CUDA bitmask kernel (lib/nms/nms_kernel.cu)
and the thrust-sorted MultiProposal NMS (dff_rfcn/operator_cxx/multi_proposal.cu:262).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lsfa_tpu.ops.boxes import pairwise_iou


def nms_fixed(boxes, scores, iou_thresh: float, max_out: int,
              valid=None, max_iters: int | None = None):
    """Greedy NMS with static shapes.

    Args:
      boxes: (N, 4) float boxes.
      scores: (N,) float scores.
      iou_thresh: suppression threshold (suppress IoU > thresh, matching
        the reference's ``keep ovr <= thresh``).
      max_out: number of kept indices to emit (padded).
      valid: optional (N,) bool mask of real entries.
      max_iters: fixpoint sweep bound; defaults to N (always exact — any
        fixpoint of the sweep equals the greedy keep-set, and a chain of
        length N is the worst case; the while_loop exits early at the
        fixpoint, typically < 10 sweeps).

    Returns:
      keep_idx: (max_out,) int32 indices into the *input* order, sorted by
        descending score. Padding slots repeat the last kept index (or 0
        when nothing is kept).
      keep_valid: (max_out,) bool mask of real (non-padding) keeps.
    """
    n = boxes.shape[0]
    if max_iters is None:
        max_iters = n
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    masked_scores = jnp.where(valid, scores, neg_inf)
    order = jnp.argsort(-masked_scores, stable=True)
    b = boxes[order]
    v = valid[order]

    iou = pairwise_iou(b, b)
    idx = jnp.arange(n)
    upper = idx[:, None] < idx[None, :]
    sup = jnp.where(upper & (iou > iou_thresh), 1.0, 0.0).astype(jnp.float32)

    def sweep(state):
        alive, prev, it = state
        hit = alive.astype(jnp.float32) @ sup          # (N,) #higher alive suppressors
        new_alive = v & (hit == 0.0)
        return new_alive, alive, it + 1

    def cond(state):
        alive, prev, it = state
        return jnp.logical_and(it < max_iters, jnp.any(alive != prev))

    alive0 = v
    alive, _, _ = jax.lax.while_loop(cond, sweep, (alive0, jnp.zeros_like(v), 0))

    # top max_out alive entries in score (=position) order
    alive_rank = jnp.where(alive, idx, n)              # alive keep their rank
    kept_pos = jnp.sort(alive_rank)
    if n < max_out:                                    # pad when fewer boxes than slots
        kept_pos = jnp.concatenate([kept_pos, jnp.full((max_out - n,), n, kept_pos.dtype)])
    kept_pos = kept_pos[:max_out]                      # ascending rank = desc score
    keep_valid = kept_pos < n
    num_kept = jnp.sum(keep_valid)
    last = jnp.where(num_kept > 0, kept_pos[jnp.maximum(num_kept - 1, 0)], 0)
    kept_pos = jnp.where(keep_valid, kept_pos, last)
    keep_idx = order[kept_pos]
    return keep_idx.astype(jnp.int32), keep_valid
