"""MobileNetV2 backbone family (alternative small trunks).

Capability target: dff_rfcn/symbols/mobilenetv2.py (standard MobileNetV2
inverted-residual trunk, width 1.0 — MobileNetV2Backbone here, stride-16
via dilating the last stride-2 stage) and mobilenetv2_hobot.py (the
Hobot variant — MobileNetV2HobotBackbone, modeled faithfully: plain
ReLU, unconditional t=1 expansion conv, undilated stride-1 res5 at
stride 16, no 1280 head conv). Selected by network.nettype
(resnet_v1_101_flownet_rfcn.py:33-40). Like the reference, these expose
only the final backbone feature (no need_part/small-net plumbing).
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
    # hobot variant: the 1x1 pointwise expansion exists even at t=1
    # (mobilenetv2_hobot.py:31-49 builds it unconditionally; standard
    # MobileNetV2 skips it when the expansion factor is 1)
    always_expand: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = nn.relu6 if self.relu6 else nn.relu
        cin = x.shape[-1]
        h = x
        if self.expand != 1 or self.always_expand:
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


class MobileNetV2HobotBackbone(nn.Module):
    """The Hobot MobileNetV2 variant, faithfully (VERDICT r4 item 8).

    Structural deltas vs the standard trunk, from
    dff_rfcn/symbols/mobilenetv2_hobot.py:16-264:
      * plain ReLU everywhere (no ReLU6),
      * bottleneck1 (t=1) KEEPS its 1x1 pointwise expansion conv
        (:31-49 builds it unconditionally; standard MBV2 skips t=1),
      * stride-16 mode runs res5 at stride 1 WITHOUT dilation (:226-233
        just flips the stride; there is no dilated variant) and forces
        is_change_stride so no skip connection forms across the stage
        boundary,
      * NO final 1280-channel head conv — the backbone output is
        bottleneck17's 320 channels (:257-264 returns the raw block).
    The fix-point (quantization-simulation) branches are asserts-false
    dead code in the reference (:92, :119) and are not modeled.
    """

    width: float = 1.0                 # `multiplier` (:10)
    inv_resolution: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.inv_resolution in (16, 32)
        x = x.astype(self.dtype)
        x = nn.Conv(int(32 * self.width), (3, 3), strides=(2, 2),
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        x = BatchNorm(dtype=self.dtype, name="conv1_bn")(x, train)
        x = nn.relu(x)
        # (expansion t, out channels, repeats, stage stride); res5's
        # stride depends on inv_resolution — stride 1 UNDILATED at 16
        cfg = [
            (1, 16, 1, 1),
            (6, 24, 2, 2),
            (6, 32, 3, 2),
            (6, 64, 4, 2),
            (6, 96, 3, 1),
            (6, 160, 3, 2 if self.inv_resolution == 32 else 1),
            (6, 320, 1, 1),
        ]
        bi = 1
        for t, ch, n, s in cfg:
            for i in range(n):
                x = InvertedResidual(
                    int(ch * self.width), stride=s if i == 0 else 1,
                    expand=t, relu6=False, always_expand=True,
                    dtype=self.dtype, name=f"bottleneck{bi}")(x, train)
                bi += 1
        return [x]
