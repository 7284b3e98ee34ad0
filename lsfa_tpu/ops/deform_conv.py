"""Deformable convolution v1 (stride 1) — gather + matmul formulation.

Capability target: the mx.contrib DeformableConvolution consumed by the
reference backbone (dff_rfcn/symbols/sym_common.py:249-262 — a zero-init
offset conv followed by the contrib DCN op; enabled in res3/4/5 by
``add_dcn``, dff_rfcn/symbols/resnet_v1_101_flownet_rfcn.py:45-46).

TPU formulation: instead of the CUDA im2col-with-offsets kernel, sample
the input once per kernel tap with bilinear gathers (zero padding outside,
like flow_warp) and contract the (H, W, K*K*Cin) sampled tensor against
the (K*K*Cin, Cout) weight — a single MXU matmul. Offsets are per
deformable-group: input channels are split into G groups, each warped by
its own (K*K, 2) offset field.

Offset layout: (H, W, G, K*K, 2) flattened to channels, last dim (dy, dx).
Zero offsets reduce exactly to a standard (dilated) 3x3 convolution.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("kernel", "dilate", "groups",
                                   "compute_dtype"))
def deform_conv(x, offsets, weight, bias=None, kernel: int = 3,
                dilate: int = 1, groups: int = 1,
                compute_dtype=jnp.float32):
    """Deformable conv, stride 1, SAME padding.

    Args:
      x: (H, W, Cin).
      offsets: (H, W, G*K*K*2), layout (g, tap, [dy, dx]).
      weight: (K, K, Cin, Cout) — HWIO like flax.
      bias: (Cout,) or None.

    Returns: (H, W, Cout).
    """
    h, w, cin = x.shape
    k = kernel
    g = groups
    assert cin % g == 0
    cpg = cin // g
    f32 = jnp.float32
    xf = x.astype(f32)
    off = offsets.astype(f32).reshape(h, w, g, k * k, 2)

    gy, gx = jnp.mgrid[0:h, 0:w]
    # kernel tap displacements around the center, dilated
    ky, kx = jnp.mgrid[0:k, 0:k]
    half = (k - 1) // 2
    dty = ((ky - half) * dilate).reshape(-1).astype(f32)   # (K*K,)
    dtx = ((kx - half) * dilate).reshape(-1).astype(f32)

    # sample positions: (H, W, G, K*K)
    sy = gy[:, :, None, None] + dty[None, None, None, :] + off[..., 0]
    sx = gx[:, :, None, None] + dtx[None, None, None, :] + off[..., 1]

    # flatten (position, group) so each group gathers with its own offsets
    xg_flat = xf.reshape(h * w, g, cpg).reshape(h * w * g, cpg)
    gids = jnp.arange(g)

    def corner(y0, x0, wgt):
        inside = (x0 >= 0) & (x0 <= w - 1) & (y0 >= 0) & (y0 <= h - 1)
        yi = jnp.clip(y0, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(x0, 0, w - 1).astype(jnp.int32)
        pidx = (yi * w + xi).reshape(h * w, g, k * k)
        idx = pidx * g + gids[None, :, None]                 # (H*W, G, K*K)
        vals = jnp.take(xg_flat, idx.reshape(-1), axis=0)
        vals = vals.reshape(h * w, g, k * k, cpg)
        m = jnp.where(inside, wgt, 0.0).reshape(h * w, g, k * k)
        return vals * m[..., None]

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy1 = sy - y0
    wx1 = sx - x0
    sampled = (corner(y0, x0, (1 - wy1) * (1 - wx1))
               + corner(y0, x0 + 1, (1 - wy1) * wx1)
               + corner(y0 + 1, x0, wy1 * (1 - wx1))
               + corner(y0 + 1, x0 + 1, wy1 * wx1))          # (H*W, G, K*K, cpg)

    # contract: weight (K, K, Cin, Cout) -> (K*K, G, cpg, Cout); the big
    # contraction runs in compute_dtype (bf16 on TPU) with f32 accumulation
    cout = weight.shape[-1]
    wmat = weight.astype(compute_dtype).reshape(k * k, g, cpg, cout)
    out = jnp.einsum("pgtc,tgco->po", sampled.astype(compute_dtype), wmat,
                     preferred_element_type=f32)
    out = out.reshape(h, w, cout)
    if bias is not None:
        out = out + bias.astype(f32)
    return out.astype(x.dtype)
