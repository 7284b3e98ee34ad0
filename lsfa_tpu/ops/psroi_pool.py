"""Position-sensitive ROI average pooling (R-FCN) — TPU-native.

Parity target: the CUDA forward kernel at
dff_rfcn/operator_cxx/psroi_pooling.cu:32-101 — per output cell
(n, ctop, ph, pw): round the roi to integer pixels, scale to the feature
grid, split into pooled_size x pooled_size fractional bins, floor/ceil the
bin to integer feature cells, clip to the map, and average the
position-specific channel c = (ctop*G + gh)*G + gw over the bin (empty
bins emit 0).

TPU redesign — no per-bin loops: the average over an axis-aligned integer
rectangle is computed from a summed-area table (2-D inclusive cumsum with
a zero border):

    sum(bin) = S[ye, xe] - S[ys, xe] - S[ye, xs] + S[ys, xs]

so every (roi, ph, pw) cell is 4 gathers — one fused vectorized gather per
corner — instead of a data-dependent nested loop. This is exact (same
additions, reassociated) and differentiates cleanly: the VJP of
cumsum+gather is scatter-add + reverse-cumsum, which is precisely the
atomic-add pattern of the CUDA backward (psroi_pooling-inl.h:101-117)
without atomics.

Layout: feature NHWC (H, W, output_dim*G*G) with channels ordered
position-major-last exactly as the rfcn_cls/rfcn_bbox 1x1 convs emit them.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _round_half_away(x):
    """C round(): halves away from zero. jnp.round is half-to-EVEN, which
    shifts the roi grid by one feature cell whenever a scaled gt coordinate
    lands on .5 (cuda round at psroi_pooling.cu:54-57)."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def _bin_bounds(rois, h, w, p, spatial_scale):
    """Integer bin bounds per (roi, cell) — cuda :54-79 semantics."""
    xs = _round_half_away(rois[:, 1]) * spatial_scale
    ys = _round_half_away(rois[:, 2]) * spatial_scale
    xe = (_round_half_away(rois[:, 3]) + 1.0) * spatial_scale
    ye = (_round_half_away(rois[:, 4]) + 1.0) * spatial_scale
    bin_w = jnp.maximum(xe - xs, 0.1) / p
    bin_h = jnp.maximum(ye - ys, 0.1) / p
    ph = jnp.arange(p, dtype=jnp.float32)
    hs = jnp.clip(jnp.floor(ph[None, :] * bin_h[:, None] + ys[:, None]), 0, h).astype(jnp.int32)
    he = jnp.clip(jnp.ceil((ph[None, :] + 1.0) * bin_h[:, None] + ys[:, None]), 0, h).astype(jnp.int32)
    ws_ = jnp.clip(jnp.floor(ph[None, :] * bin_w[:, None] + xs[:, None]), 0, w).astype(jnp.int32)
    we = jnp.clip(jnp.ceil((ph[None, :] + 1.0) * bin_w[:, None] + xs[:, None]), 0, w).astype(jnp.int32)
    return hs, he, ws_, we


@partial(jax.jit, static_argnames=("output_dim", "group_size", "pooled_size",
                                   "spatial_scale"))
def psroi_pool(feat, rois, output_dim: int, group_size: int = 7,
               pooled_size: int = 7, spatial_scale: float = 1.0 / 16):
    """Position-sensitive ROI average pooling — MXU (matmul) formulation.

    The bin average is separable: with row/col membership indicators
    r[n,ph,y] and c[n,pw,x], pooled[n,ph,pw,o] =
        (1/area) * sum_y r[n,ph,y] * sum_x c[n,pw,x] * F[y,x,o,ph,pw]
    i.e. two einsum contractions that run on the MXU — no per-bin loops
    and no scalar gathers (the gather/SAT variant below is the latency-
    bound fallback kept for cross-checking). Exact same sums as the CUDA
    kernel, reassociated.

    Args / returns: see psroi_pool_sat.
    """
    h, w, ch = feat.shape
    g, p = group_size, pooled_size
    assert ch == output_dim * g * g, (ch, output_dim, g)
    assert g == p, "matmul formulation assumes group_size == pooled_size"
    n = rois.shape[0]
    # contract in the feature's own dtype (f32 accumulation below): for a
    # bf16 model the map values carry bf16 precision anyway, and MXU
    # bf16 x bf16 -> f32 products are exact, so this is bit-identical to
    # upcasting the whole map first. f32 inputs stay f32 (CPU parity).
    opdt = feat.dtype if feat.dtype == jnp.bfloat16 else jnp.float32
    f = feat.astype(opdt).reshape(h, w, output_dim, g, g)

    hs, he, ws_, we = _bin_bounds(rois, h, w, p, spatial_scale)
    ys = jnp.arange(h, dtype=jnp.int32)
    xs2 = jnp.arange(w, dtype=jnp.int32)
    row = ((ys[None, None, :] >= hs[:, :, None])
           & (ys[None, None, :] < he[:, :, None])).astype(jnp.float32)
    col = ((xs2[None, None, :] >= ws_[:, :, None])
           & (xs2[None, None, :] < we[:, :, None])).astype(opdt)

    # A[n, q(pw), y, o, p(ph)] = sum_x col[n,q,x] F[y,x,o,p,q]
    a = jnp.einsum("nqx,yxopq->nqyop", col, f,
                   preferred_element_type=jnp.float32)
    # pooled[n, p, q, o] = sum_y row[n,p,y] A[n,q,y,o,p]
    pooled = jnp.einsum("npy,nqyop->npqo", row, a,
                        preferred_element_type=jnp.float32)

    area = ((he - hs)[:, :, None] * (we - ws_)[:, None, :]).astype(jnp.float32)
    empty = area <= 0
    return jnp.where(empty[..., None], 0.0,
                     pooled / jnp.maximum(area, 1.0)[..., None])


@partial(jax.jit, static_argnames=("output_dim", "group_size", "pooled_size",
                                   "spatial_scale"))
def psroi_pool_sat(feat, rois, output_dim: int, group_size: int = 7,
                   pooled_size: int = 7, spatial_scale: float = 1.0 / 16):
    """Summed-area-table gather formulation (reference cross-check).

    Args:
      feat: (H, W, C) single-image feature, C == output_dim * G * G.
      rois: (N, 5) [batch_idx, x1, y1, x2, y2] at input-image scale.
      output_dim: channels per pooled cell (e.g. #classes, or 4*2).

    Returns:
      (N, pooled_size, pooled_size, output_dim) float32.
    """
    h, w, c = feat.shape
    g, p = group_size, pooled_size
    assert c == output_dim * g * g, (c, output_dim, g)

    f = feat.astype(jnp.float32)
    # summed-area table with zero border: S[i, j] = sum(f[:i, :j])
    sat = jnp.cumsum(jnp.cumsum(f, axis=0), axis=1)
    sat = jnp.pad(sat, ((1, 0), (1, 0), (0, 0)))          # (H+1, W+1, C)
    # rearrange to (G*G planes, (H+1)*(W+1), output_dim) so that plane
    # q = gh*G + gw holds channel c = (ctop*G + gh)*G + gw for all ctop
    sat = sat.reshape((h + 1) * (w + 1), output_dim, g * g)
    sat = jnp.moveaxis(sat, -1, 0).reshape(g * g * (h + 1) * (w + 1), output_dim)

    # roi geometry + bin bounds: one shared implementation with the matmul
    # path (a divergent copy here would defeat the cross-check)
    hs, he, ws_, we = _bin_bounds(rois, h, w, p, spatial_scale)

    # group cell of each pooled cell (gh == ph, gw == pw when G == P)
    gh = jnp.clip((jnp.arange(p) * g) // p, 0, g - 1)
    plane = (gh[:, None] * g + gh[None, :]).astype(jnp.int32)      # (P, P)

    # broadcast to (N, P, P): rows index ph via hs/he, cols index pw via ws/we
    ys_i = hs[:, :, None]          # (N, P, 1)
    ye_i = he[:, :, None]
    xs_i = ws_[:, None, :]         # (N, 1, P)
    xe_i = we[:, None, :]
    base = plane[None] * ((h + 1) * (w + 1))                        # (1, P, P)

    def corner(yy, xx):
        idx = base + yy * (w + 1) + xx                              # (N, P, P)
        return jnp.take(sat, idx.reshape(-1), axis=0).reshape(idx.shape + (output_dim,))

    total = (corner(ye_i, xe_i) - corner(ys_i, xe_i)
             - corner(ye_i, xs_i) + corner(ys_i, xs_i))
    area = ((ye_i - ys_i) * (xe_i - xs_i)).astype(jnp.float32)
    empty = area <= 0
    out = jnp.where(empty[..., None], 0.0, total / jnp.maximum(area, 1.0)[..., None])
    return out
