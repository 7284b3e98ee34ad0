"""Bilinear feature warping by a flow field — THE propagation primitive.

Fuses the reference's GridGenerator(transform_type='warp') +
BilinearSampler pair (used for both FlowNet warping and motion-vector
warping, dff_rfcn/symbols/resnet_v1_101_flownet_rfcn.py:306-307,320-321,
468-469,571-572) into one gather-based op.

Semantics (matching MXNet): output(y, x) = bilinear sample of the input
at (x + flow_x(y, x), y + flow_y(y, x)), with zero contribution from any
corner outside the feature extent (border zero-padding). Differentiable
via JAX autodiff (gather VJP = scatter-add, mirroring the CUDA
BilinearSampler backward).

Layout is NHWC (TPU-native); flow is (..., H, W, 2) with channel order
(dx, dy) — the same (x-then-y) channel order the reference feeds from
motion vectors / FlowNet output.
"""

from __future__ import annotations

import jax.numpy as jnp


def flow_warp(feat, flow):
    """Warp `feat` by `flow`.

    Args:
      feat: (H, W, C) or (B, H, W, C) feature map.
      flow: (H, W, 2) or (B, H, W, 2); flow[..., 0]=dx, flow[..., 1]=dy.

    Returns:
      warped feature of the same shape as `feat`.
    """
    if feat.ndim == 4:
        import jax
        return jax.vmap(flow_warp)(feat, flow)
    h, w, c = feat.shape
    orig_dtype = feat.dtype
    f = feat.astype(jnp.float32)
    fl = flow.astype(jnp.float32)

    gy, gx = jnp.mgrid[0:h, 0:w]
    sx = gx + fl[..., 0]
    sy = gy + fl[..., 1]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    x1 = x0 + 1.0
    y1 = y0 + 1.0
    wx1 = sx - x0
    wy1 = sy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def corner(yc, xc, wgt):
        inside = (xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1)
        xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        vals = jnp.take(f.reshape(h * w, c), yi * w + xi, axis=0)
        wgt = jnp.where(inside, wgt, 0.0)
        return vals * wgt[..., None]

    out = (corner(y0, x0, wy0 * wx0) + corner(y0, x1, wy0 * wx1)
           + corner(y1, x0, wy1 * wx0) + corner(y1, x1, wy1 * wx1))
    return out.astype(orig_dtype)
