"""LSFA aggregation modules: R-net, F-net, Nq-net, FGFA embedding, and the
short-term small-net fusion.

Behavioral targets (dff_rfcn/symbols/resnet_v1_101_flownet_rfcn.py):
  * RNet       — res_diff_ada (:57-67): optional BN, N x (3x3/256 relu),
                 final 1x1 -> feat_dim. Shipped recipe: N=0 (one 1x1 conv).
  * FNet       — fuse_ada (:69-92): 'conv#N' stack or a 'res' bottleneck
                 with skip. Shipped recipe: disabled ('None').
  * NqNet      — Nq_net (:94-109): per-pixel 2-way softmax quality weights
                 over (warped, fresh), computed by a shared 3-conv tower
                 applied to both.
  * FgfaEmbed  — get_embednet/compute_weight/Fgfa_net (:111-148): cosine
                 similarity of learned embeddings as aggregation weights.
  * SmallNetFuse — fuse_small_net (:209-275): run the backbone's early
                 stage on a 4x (or 2x) downscaled current frame and fuse
                 into the propagated feature (5 fuse variants).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from lsfa_tpu.models.layers import (
    INIT01, INIT_MSRA, BatchNorm, avg_pool, conv, global_avg_pool)


class RNet(nn.Module):
    """Residual-adaptation net mapping the decoded residual to feature space."""

    num_conv: int = 0
    feat_dim: int = 1024
    use_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, res_diff, train: bool = False):
        x = res_diff.astype(self.dtype)
        if self.use_bn:
            x = BatchNorm(frozen=False, dtype=self.dtype, name="bn")(x, train)
        for i in range(self.num_conv):
            x = nn.relu(conv(x, 256, 3, name=f"conv{i}", dtype=self.dtype, kernel_init=INIT01))
        return conv(x, self.feat_dim, 1, name=f"conv{self.num_conv}", dtype=self.dtype, kernel_init=INIT01)


class FNet(nn.Module):
    """Fused-feature adaptation net ('conv#N' stack or 'res' bottleneck)."""

    fnet_type: str = "None"
    feat_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        t = self.fnet_type
        if "conv" in t:
            for i in range(int(t.split("#")[1])):
                x = nn.relu(conv(x, self.feat_dim, 3, name=f"conv{i}", dtype=self.dtype, kernel_init=INIT01))
            return x
        if "res" in t:
            h = nn.relu(conv(x, 256, 1, name="conv0", dtype=self.dtype, kernel_init=INIT01))
            h = nn.relu(conv(h, 256, 3, name="conv1", dtype=self.dtype, kernel_init=INIT01))
            h = nn.relu(conv(h, self.feat_dim, 1, name="conv2", dtype=self.dtype, kernel_init=INIT01))
            return h + x
        return x  # 'None': identity


class NqNet(nn.Module):
    """Long-term aggregation: learned per-pixel quality weights."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, warp_feat, conv_feat):
        # shared tower applied to both inputs (reference concatenates on the
        # batch axis; functionally identical)
        both = jnp.stack([warp_feat, conv_feat], axis=0).astype(self.dtype)
        h = nn.relu(conv(both, 256, 3, name="conv1", dtype=self.dtype, kernel_init=INIT01))
        h = nn.relu(conv(h, 16, 1, name="conv2", dtype=self.dtype, kernel_init=INIT01))
        logits = conv(h, 1, 1, name="conv3", dtype=self.dtype, kernel_init=INIT01)   # (2, ..., 1)
        wgt = nn.softmax(logits.astype(jnp.float32), axis=0)
        return wgt[0] * warp_feat + wgt[1] * conv_feat


class FgfaEmbed(nn.Module):
    """FGFA-style cosine-similarity aggregation (alternative to NqNet)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, warp_feat, conv_feat):
        both = jnp.stack([conv_feat, warp_feat], axis=0).astype(self.dtype)
        e = nn.relu(conv(both, 512, 1, name="em_conv1", dtype=self.dtype, kernel_init=INIT_MSRA))
        e = nn.relu(conv(e, 512, 3, name="em_conv2", dtype=self.dtype, kernel_init=INIT_MSRA))
        e = conv(e, 2048, 1, name="em_conv3", dtype=self.dtype, kernel_init=INIT_MSRA).astype(jnp.float32)
        e_cur, e_warp = e[0], e[1]

        def l2n(v):
            return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + 1e-10)

        w_warp = jnp.sum(l2n(e_warp) * l2n(e_cur), axis=-1, keepdims=True)
        w_cur = jnp.sum(l2n(e_cur) * l2n(e_cur), axis=-1, keepdims=True)
        wgt = nn.softmax(jnp.stack([w_warp, w_cur], axis=0), axis=0)
        return wgt[0] * warp_feat + wgt[1] * conv_feat


class SmallNetFuse(nn.Module):
    """Short-term aggregation: fuse downscaled-current-frame evidence.

    The small backbone trunk is owned by the caller (it is a prefixed copy
    of the main backbone); this module implements the downscale + fuse.
    """

    fuse_type: str = "add"
    stride: int = 4               # 4 -> use c2 (256ch); 8 -> c3 (512ch)
    bn_before_fuse: bool = False
    scale_before_fuse: bool = False
    feat_dim: int = 1024
    dtype: Any = jnp.float32

    def downscale(self, cur_img):
        return avg_pool(cur_img, 4 if self.stride == 4 else 2)

    @nn.compact
    def __call__(self, warp_feat, small_feat, train: bool = False):
        d = self.dtype
        cur = small_feat.astype(d)
        nf = cur.shape[-1]
        if self.scale_before_fuse:
            cur = conv(cur, nf, 1, name="cur_scale", dtype=d, kernel_init=INIT01)
        ft = self.fuse_type
        if ft == "add":
            cur = conv(cur, self.feat_dim, 3, name="fuse_reduce_add", dtype=d, kernel_init=INIT01)
            if self.bn_before_fuse:
                cur = BatchNorm(frozen=not train, dtype=d, name="cur_feat_bn")(cur, train)
                warp_feat = BatchNorm(frozen=not train, dtype=d,
                                      name="warp_conv_feat_bn")(warp_feat, train)
            return cur + warp_feat
        if ft == "addv2":
            cur = nn.relu(conv(cur, nf, 3, name="fuse_reduce_add_conv1", dtype=d, kernel_init=INIT01))
            cur = conv(cur, self.feat_dim, 1, name="fuse_reduce_add_conv2", dtype=d, kernel_init=INIT01)
            if self.bn_before_fuse:
                cur = BatchNorm(frozen=False, dtype=d, name="cur_feat_bn")(cur, train)
                warp_feat = BatchNorm(frozen=False, dtype=d,
                                      name="warp_conv_feat_bn")(warp_feat, train)
            return cur + warp_feat
        if ft == "concat":
            cur = conv(cur, 512, 3, name="fuse_reduce_c1", dtype=d, kernel_init=INIT01)
            wrp = conv(warp_feat, 512, 3, name="fuse_reduce_c2", dtype=d, kernel_init=INIT01)
            cat = jnp.concatenate([wrp, cur], axis=-1)
            return conv(cat, self.feat_dim, 3, name="fuse_reduce", dtype=d, kernel_init=INIT01)
        if ft == "concatv1":
            cur = conv(cur, 512, 3, name="fuse_reduce_c1", dtype=d, kernel_init=INIT01)
            wrp = conv(warp_feat, 512, 3, name="fuse_reduce_c2", dtype=d, kernel_init=INIT01)
            cat = jnp.concatenate([wrp, cur], axis=-1)
            cat = nn.relu(conv(cat, self.feat_dim, 3, name="fuse_reduce", dtype=d, kernel_init=INIT01))
            s = global_avg_pool(cat)
            s = nn.relu(conv(s, self.feat_dim, 1, name="s_feat_conv1", dtype=d, kernel_init=INIT01))
            s = nn.sigmoid(conv(s, self.feat_dim, 1, name="s_feat_conv2", dtype=d, kernel_init=INIT01))
            return cat * s + cat
        if ft == "concatv2":
            cur = conv(cur, self.feat_dim, 3, name="fuse_reduce_c1", dtype=d, kernel_init=INIT01)
            cat = jnp.concatenate([warp_feat, cur], axis=-1)
            s = global_avg_pool(cat)
            s = nn.relu(conv(s, self.feat_dim, 1, name="s_feat_conv1", dtype=d, kernel_init=INIT01))
            s = nn.sigmoid(conv(s, self.feat_dim, 1, name="s_feat_conv2", dtype=d, kernel_init=INIT01))
            return cur * s + warp_feat
        raise ValueError(f"unknown small_net_fuse_type: {ft}")
