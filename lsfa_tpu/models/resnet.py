"""Parametric ResNet backbone (flax.linen, NHWC, pre-activation units).

Capability target: dff_rfcn/symbols/resnet.py — depths 18..269, pre-act
("resnet"/v2-style) units with an input BN, stride-16 output via dilation
in the last stage (inv_resolution=16), optional deformable 3x3 convs in
the tail units of stages 2-4 (deformable_units=[0,1,1,3], 4 groups — the
shipped LSFA config), and ``need_part``-style intermediate outputs used by
the short-term small net.

TPU notes: NHWC layout, configurable compute dtype (bfloat16 by default in
the LSFA config), BN frozen per the reference fine-tuning recipe.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from lsfa_tpu.models.layers import BN_EPS, BatchNorm, conv, max_pool_3x3_s2
from lsfa_tpu.ops.deform_conv import deform_conv

RESNET_UNITS = {
    18: [2, 2, 2, 2], 26: [3, 3, 3, 3], 34: [3, 4, 6, 3], 50: [3, 4, 6, 3],
    101: [3, 4, 23, 3], 152: [3, 8, 36, 3], 200: [3, 24, 36, 3], 269: [3, 30, 48, 8],
}


class DeformConv2d(nn.Module):
    """Zero-init offset conv + deformable 3x3 conv (sym_common.py:249-262)."""

    features: int
    dilate: int = 1
    groups: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = 3
        off = nn.Conv(self.groups * k * k * 2, (k, k),
                      kernel_dilation=(self.dilate, self.dilate), padding="SAME",
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      name="offset", dtype=jnp.float32)(x.astype(jnp.float32))
        w = self.param("kernel", nn.initializers.he_normal(),
                       (k, k, x.shape[-1], self.features), jnp.float32)
        if x.ndim == 4:
            import jax
            return jax.vmap(lambda xi, oi: deform_conv(
                xi, oi, w, None, kernel=k, dilate=self.dilate,
                groups=self.groups, compute_dtype=self.dtype))(x, off)
        return deform_conv(x, off, w, None, kernel=k, dilate=self.dilate,
                           groups=self.groups, compute_dtype=self.dtype)


class NonLocalBlock(nn.Module):
    """Embedded-gaussian non-local block (optional backbone insert;
    reference: dff_rfcn/symbols/resnet.py:41-68, embedded_gaussian mode)."""

    features: int
    compress: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        mid = self.features // 2
        x1 = conv(x, mid, 1, name="conv_x1", dtype=self.dtype)
        x2 = conv(x, mid, 1, name="conv_x2", dtype=self.dtype)
        g = conv(x, mid, 1, name="conv_g", dtype=self.dtype)
        if self.compress:
            x1 = nn.max_pool(x1, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
            g = nn.max_pool(g, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        q = x2.reshape(b, h * w, mid).astype(jnp.float32)
        k = x1.reshape(b, -1, mid).astype(jnp.float32)
        v = g.reshape(b, -1, mid).astype(jnp.float32)
        att = nn.softmax(jnp.einsum("bqc,bkc->bqk", q, k,
                                    preferred_element_type=jnp.float32), axis=-1)
        y = jnp.einsum("bqk,bkc->bqc", att, v).reshape(b, h, w, mid)
        y = conv(y.astype(self.dtype), self.features, 1, name="conv_y",
                 dtype=self.dtype)
        return x + y


class PreactUnit(nn.Module):
    """Full pre-activation residual unit (bn-relu-conv x3 bottleneck or x2
    basic); shortcut taken from the first post-activation when dims change
    (reference resnet_residual_unit, dff_rfcn/symbols/resnet.py:70-101)."""

    features: int
    stride: int = 1
    dilate: int = 1
    dim_match: bool = True
    bottleneck: bool = True
    deformable_groups: int = 0   # >0 => conv2 is deformable
    frozen_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.features // 4 if self.bottleneck else self.features

        def bn_relu(h, name):
            h = BatchNorm(frozen=self.frozen_bn, dtype=self.dtype, name=name)(h, train)
            return nn.relu(h)

        def conv3x3(h, feats, stride, name):
            if self.deformable_groups > 0:
                assert stride == 1, "deformable conv supports stride 1"
                return DeformConv2d(feats, dilate=self.dilate,
                                    groups=self.deformable_groups,
                                    dtype=self.dtype, name=name)(h)
            return conv(h, feats, 3, stride, self.dilate, use_bias=False,
                        name=name, dtype=self.dtype)

        if self.bottleneck:
            a1 = bn_relu(x, "bn1")
            h = conv(a1, mid, 1, 1, use_bias=False, name="conv1", dtype=self.dtype)
            h = bn_relu(h, "bn2")
            h = conv3x3(h, mid, self.stride, "conv2")
            h = bn_relu(h, "bn3")
            h = conv(h, self.features, 1, 1, use_bias=False, name="conv3", dtype=self.dtype)
        else:
            a1 = bn_relu(x, "bn1")
            h = conv3x3(a1, self.features, self.stride, "conv1")
            h = bn_relu(h, "bn2")
            h = conv(h, self.features, 3, 1, 1, use_bias=False, name="conv2", dtype=self.dtype)

        if self.dim_match:
            sc = x
        else:
            sc = conv(a1, self.features, 1, self.stride, use_bias=False,
                      name="sc", dtype=self.dtype)
        return h + sc


class ResNetBackbone(nn.Module):
    """Backbone returning per-stage features [c2, c3, c4, c5, post]
    (``post`` = final bn+relu output, the detection trunk input)."""

    num_layer: int = 101
    inv_resolution: int = 16
    deformable_units: Sequence[int] = (0, 0, 0, 0)
    num_deformable_group: Sequence[int] = (0, 0, 0, 0)
    frozen_bn: bool = True
    num_stages: int = 4   # build only the first k stages (small-net trunk)
    non_local: bool = False   # insert a non-local block late in stage 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        units = RESNET_UNITS[self.num_layer]
        bottleneck = self.num_layer >= 50
        filters = [256, 512, 1024, 2048] if bottleneck else [64, 128, 256, 512]
        if self.inv_resolution == 32:
            inc_dilate = [False] * 4
        elif self.inv_resolution == 16:
            inc_dilate = [False, False, False, True]
        elif self.inv_resolution == 8:
            inc_dilate = [False, False, True, True]
        else:
            raise ValueError(self.inv_resolution)

        x = x.astype(self.dtype)
        # input BN (reference net_type='resnet': sym.bn 'bn_data' fix_gamma)
        x = nn.BatchNorm(use_running_average=True, epsilon=BN_EPS,
                         use_scale=False, dtype=self.dtype, name="bn_data")(x)
        # stem: conv7x7/64/s2 + bn + relu + maxpool3x3/s2
        x = conv(x, 64, 7, 2, use_bias=False, name="conv0", dtype=self.dtype)
        x = BatchNorm(frozen=self.frozen_bn, dtype=self.dtype, name="bn0")(x, train)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)

        parts = []
        dilate = 1
        for s in range(self.num_stages):
            stride = 1 if s == 0 else 2
            if inc_dilate[s]:
                dilate, stride = dilate * stride, 1
            n_units = units[s]
            for u in range(n_units):
                is_deform = (u + 1) >= n_units - self.deformable_units[s] + 1
                x = PreactUnit(
                    features=filters[s],
                    stride=stride if u == 0 else 1,
                    dilate=dilate,
                    dim_match=(u != 0),
                    bottleneck=bottleneck,
                    deformable_groups=(self.num_deformable_group[s]
                                       if is_deform and self.deformable_units[s] > 0 else 0),
                    frozen_bn=self.frozen_bn,
                    dtype=self.dtype,
                    name=f"stage{s + 1}_unit{u + 1}",
                )(x, train)
                if (self.non_local and s == 2 and u == n_units - 2):
                    x = NonLocalBlock(filters[s], dtype=self.dtype,
                                      name="non_local")(x)
            parts.append(x)

        if self.num_stages == 4:
            post = BatchNorm(frozen=self.frozen_bn, dtype=self.dtype, name="bn1")(x, train)
            post = nn.relu(post)
            parts.append(post)
        return parts
