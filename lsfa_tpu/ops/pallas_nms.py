"""Pallas TPU kernel: fused NMS suppression (IoU build + sweeps in VMEM).

The XLA formulation in ops/nms.py materializes the (N, N) suppression
matrix in HBM and re-reads it on every fixpoint sweep (~16 passes x 8 MB
at the deployed N=2048 tier). This kernel keeps the whole matrix in VMEM:

  * boxes (N, 4) arrive in VMEM (32 KB),
  * the strict-upper-triangular IoU>thresh mask is built row-block by
    row-block into a VMEM scratch (bf16, N*N = 8 MB at N=2048),
  * all sweeps run as (1, N) x (N, N) MXU matvecs against that scratch —
    zero HBM traffic after the build.

Semantics identical to ops.nms._greedy_alive (same +1 IoU convention,
same sweep recurrence); cross-checked by tests against the XLA path and
the sequential-greedy oracle. Used when N fits VMEM (N <= 2048) on TPU;
callers fall back to the XLA path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 128   # keeps f32 IoU intermediates small enough to fit VMEM
                  # alongside the full bf16 suppression matrix


def _kernel(boxes_ref, valid_ref, alive_ref, sup_ref, *, iou_thresh,
            num_sweeps, n):
    boxes = boxes_ref[:]                               # (N, 4) f32
    x1 = boxes[:, 0]
    y1 = boxes[:, 1]
    x2 = boxes[:, 2]
    y2 = boxes[:, 3]
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (ROW_BLOCK, n), 1)

    # build sup (strict upper triangle of IoU > thresh) one row-block at a
    # time via fori_loop so only ONE block's f32 intermediates are live
    def build_block(rb, _):
        r0 = rb * ROW_BLOCK
        blk = boxes_ref[pl.ds(r0, ROW_BLOCK), :]   # dynamic ref slice
        rx1 = blk[:, 0]
        ry1 = blk[:, 1]
        rx2 = blk[:, 2]
        ry2 = blk[:, 3]
        ra = (rx2 - rx1 + 1.0) * (ry2 - ry1 + 1.0)
        iw = (jnp.minimum(rx2[:, None], x2[None, :])
              - jnp.maximum(rx1[:, None], x1[None, :]) + 1.0)
        ih = (jnp.minimum(ry2[:, None], y2[None, :])
              - jnp.maximum(ry1[:, None], y1[None, :]) + 1.0)
        inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
        union = ra[:, None] + area[None, :] - inter
        iou = inter / jnp.maximum(union, 1e-10)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (ROW_BLOCK, n), 0) + r0
        upper = row_ids < col_ids
        sup_ref[pl.ds(r0, ROW_BLOCK), :] = jnp.where(
            upper & (iou > iou_thresh), 1.0, 0.0).astype(jnp.bfloat16)
        return 0

    jax.lax.fori_loop(0, n // ROW_BLOCK, build_block, 0)

    valid = valid_ref[:].astype(jnp.float32)           # (1, N)

    def sweep(alive):
        hit = jnp.dot(alive.astype(jnp.bfloat16), sup_ref[:],
                      preferred_element_type=jnp.float32)
        return valid * jnp.where(hit == 0.0, 1.0, 0.0)

    # fixpoint exit mirrors ops.nms._greedy_alive: real suppression chains
    # converge in 3-6 sweeps, so exiting on alive == prev (tested on
    # device, all-VMEM operands) drops ~25 no-op matvecs off the default
    # 31-sweep cap while keeping the cap for adversarial chains.
    def cond(c):
        a, prev, i = c
        return jnp.logical_and(i < num_sweeps, jnp.any(a != prev))

    def body(c):
        a, _, i = c
        return sweep(a), a, i + 1

    if num_sweeps <= 0:
        alive = valid
    else:
        alive, _, _ = jax.lax.while_loop(
            cond, body, (sweep(valid), valid, jnp.int32(1)))
    alive_ref[:] = alive


@functools.partial(jax.jit, static_argnames=("iou_thresh", "num_sweeps",
                                             "interpret"))
def greedy_alive_pallas(boxes, valid, iou_thresh: float, num_sweeps: int,
                        interpret: bool = False):
    """Fused greedy-NMS alive mask. boxes (N, 4) rank-sorted, N % 128 == 0,
    N <= 2048 (sup matrix must fit VMEM). Returns (N,) bool."""
    n = boxes.shape[0]
    assert n % ROW_BLOCK == 0 and n <= 2048, n
    alive = pl.pallas_call(
        functools.partial(_kernel, iou_thresh=iou_thresh,
                          num_sweeps=num_sweeps, n=n),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n, n), jnp.bfloat16)],
        interpret=interpret,
    )(boxes.astype(jnp.float32), valid.reshape(1, n).astype(jnp.float32))
    return alive[0] > 0.5
