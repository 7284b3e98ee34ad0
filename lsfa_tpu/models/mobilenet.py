"""MobileNetV2 backbone family (alternative small trunks).

Capability target: dff_rfcn/symbols/mobilenetv2.py (standard MobileNetV2
inverted-residual trunk, width 1.0) and mobilenetv2_hobot.py (the
variant with ReLU instead of ReLU6 and no expansion on the stem block),
selected by network.nettype (resnet_v1_101_flownet_rfcn.py:33-40). Like
the reference, these expose only the final backbone feature (no
need_part/small-net plumbing).

Stride-16 output: the reference keeps MobileNetV2's stage strides but
dilates the last stride-2 stage, mirroring inv_resolution=16.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from lsfa_tpu.models.layers import BatchNorm

# (expansion t, channels c, repeats n, stride s) — MobileNetV2 paper table 2
_MBV2_CFG = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),   # dilated instead of strided for stride-16 output
    (6, 320, 1, 1),
]


class InvertedResidual(nn.Module):
    features: int
    stride: int = 1
    expand: int = 6
    dilate: int = 1
    relu6: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = nn.relu6 if self.relu6 else nn.relu
        cin = x.shape[-1]
        h = x
        if self.expand != 1:
            h = nn.Conv(cin * self.expand, (1, 1), use_bias=False,
                        dtype=self.dtype, name="expand")(h)
            h = BatchNorm(dtype=self.dtype, name="expand_bn")(h, train)
            h = act(h)
        h = nn.Conv(h.shape[-1], (3, 3), strides=(self.stride, self.stride),
                    kernel_dilation=(self.dilate, self.dilate),
                    feature_group_count=h.shape[-1], padding="SAME",
                    use_bias=False, dtype=self.dtype, name="dw")(h)
        h = BatchNorm(dtype=self.dtype, name="dw_bn")(h, train)
        h = act(h)
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project")(h)
        h = BatchNorm(dtype=self.dtype, name="project_bn")(h, train)
        if self.stride == 1 and cin == self.features:
            h = h + x
        return h


class MobileNetV2Backbone(nn.Module):
    width: float = 1.0
    relu6: bool = True            # hobot variant uses plain relu
    inv_resolution: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = nn.relu6 if self.relu6 else nn.relu
        x = x.astype(self.dtype)
        c = int(32 * self.width)
        x = nn.Conv(c, (3, 3), strides=(2, 2), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="stem")(x)
        x = BatchNorm(dtype=self.dtype, name="stem_bn")(x, train)
        x = act(x)
        stride_total = 2
        dilate = 1
        for si, (t, ch, n, s) in enumerate(_MBV2_CFG):
            feats = int(ch * self.width)
            for i in range(n):
                stride = s if i == 0 else 1
                if stride == 2 and stride_total >= self.inv_resolution:
                    stride, dilate = 1, dilate * 2
                elif stride == 2:
                    stride_total *= 2
                x = InvertedResidual(feats, stride=stride, expand=t,
                                     dilate=dilate, relu6=self.relu6,
                                     dtype=self.dtype,
                                     name=f"block{si}_{i}")(x, train)
        x = nn.Conv(int(1280 * max(self.width, 1.0)), (1, 1), use_bias=False,
                    dtype=self.dtype, name="head")(x)
        x = BatchNorm(dtype=self.dtype, name="head_bn")(x, train)
        return [act(x)]
