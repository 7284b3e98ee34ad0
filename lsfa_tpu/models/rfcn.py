"""Single-frame R-FCN baseline (the reference's `rfcn/` experiment package).

Behavioral target: rfcn/symbols/resnet_v1_101_rfcn.py — plain backbone +
dilated feat conv + RPN + position-sensitive heads, no video machinery.
Shares all head conventions with LSFA (channel layouts, anchor
normalization), so the detection post-processing in eval/ works unchanged.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from lsfa_tpu.models.layers import INIT01
from lsfa_tpu.models.resnet import ResNetBackbone


class RFCN(nn.Module):
    num_classes: int = 31
    # 2 when CLASS_AGNOSTIC (resnet_v1_101_rfcn.py num_reg_classes)
    num_reg_classes: int = 2
    feat_dim: int = 1024
    num_layer: int = 101
    num_anchors: int = 9
    add_dcn: bool = False
    anchor_means: Sequence[float] = (0.0, 0.0, 0.0, 0.0)
    anchor_stds: Sequence[float] = (0.1, 0.1, 0.4, 0.4)
    normalize_rpn: bool = True
    pixel_means: Sequence[float] = (0.0, 0.0, 0.0)   # BGR
    pixel_scale: float = 1.0
    dtype: Any = jnp.float32

    def setup(self):
        dcn_u = (0, 1, 1, 3) if self.add_dcn else (0, 0, 0, 0)
        dcn_g = (0, 4, 4, 4) if self.add_dcn else (0, 0, 0, 0)
        self.backbone = ResNetBackbone(
            num_layer=self.num_layer, inv_resolution=16,
            deformable_units=dcn_u, num_deformable_group=dcn_g,
            dtype=self.dtype, name="backbone")
        self.feat_conv_3x3 = nn.Conv(self.feat_dim, (3, 3), kernel_dilation=(6, 6),
                                     padding="SAME", dtype=self.dtype,
                                     name="feat_conv_3x3", kernel_init=INIT01)
        a = self.num_anchors
        self.rpn_cls_score = nn.Conv(2 * a, (1, 1), dtype=self.dtype,
                                     name="rpn_cls_score", kernel_init=INIT01)
        self.rpn_bbox_pred = nn.Conv(4 * a, (1, 1), dtype=self.dtype,
                                     name="rpn_bbox_pred", kernel_init=INIT01)
        g = 7
        self.rfcn_cls = nn.Conv(self.num_classes * g * g, (1, 1),
                                dtype=self.dtype, name="rfcn_cls", kernel_init=INIT01)
        self.rfcn_bbox = nn.Conv(4 * self.num_reg_classes * g * g, (1, 1),
                                 dtype=self.dtype, name="rfcn_bbox", kernel_init=INIT01)

    def rpn_fg_probs(self, cls_logits):
        a = self.num_anchors
        shp = cls_logits.shape
        pair = jnp.stack([cls_logits[..., :a], cls_logits[..., a:]], axis=-1)
        return nn.softmax(pair, axis=-1)[..., 1].reshape(shp[:-1] + (a,))

    def rpn_decode_deltas(self, deltas):
        if not self.normalize_rpn:
            return deltas
        std = jnp.tile(jnp.asarray(self.anchor_stds, jnp.float32), self.num_anchors)
        mean = jnp.tile(jnp.asarray(self.anchor_means, jnp.float32), self.num_anchors)
        return deltas * std + mean

    def __call__(self, data, train: bool = False):
        # raw resized BGR in (uint8/float); normalize on device
        x = data.astype(jnp.float32)[..., ::-1]
        means = jnp.asarray(self.pixel_means, jnp.float32)[::-1]
        data = (x - means) * self.pixel_scale
        parts = self.backbone(data, train)
        feat = nn.relu(self.feat_conv_3x3(parts[-1]))
        half = self.feat_dim // 2
        rpn_feat, rfcn_feat = feat[..., :half], feat[..., half:]
        rpn_cls = self.rpn_cls_score(rpn_feat).astype(jnp.float32)
        rpn_bbox = self.rpn_bbox_pred(rpn_feat).astype(jnp.float32)
        return {
            "feat": feat,
            "rpn_cls": rpn_cls,
            "rpn_bbox": rpn_bbox,
            "rpn_fg": self.rpn_fg_probs(rpn_cls),
            "rpn_deltas": self.rpn_decode_deltas(rpn_bbox),
            # model-dtype maps: psroi_pool contracts bf16 operands with
            # f32 accumulation (bit-identical to upcasting first)
            "rfcn_cls_map": self.rfcn_cls(rfcn_feat),
            "rfcn_bbox_map": self.rfcn_bbox(rfcn_feat),
        }
