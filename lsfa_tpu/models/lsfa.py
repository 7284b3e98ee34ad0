"""The LSFA model: R-FCN detection over long/short-term aggregated features.

Graph-level behavioral targets (dff_rfcn/symbols/resnet_v1_101_flownet_rfcn.py):
  * train graph        — get_train_symbol (:277-446)
  * key-frame graph    — get_key_test_symbol (:448-551)
  * non-key graph      — get_cur_test_symbol (:553-659)
  * batched-GOP graph  — get_batch_test_symbol (:661-751)

TPU redesign: one functional flax module with methods for each phase;
the data-dependent ChooseFeat / ChooseOldKeyFeat custom ops (which forced
device->host syncs in the reference) become jnp.where selects entirely
on-device; the two-graph host dispatch of the reference tester becomes two
jitted functions sharing one parameter pytree.

Feature layout: NHWC. The aggregated 1024-ch "DFF feature" is split along
channels into (rpn_feat, rfcn_feat) halves, mirroring the reference's
SliceChannel(axis=1, num_outputs=2) (:340).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from lsfa_tpu.models.aggregation import FgfaEmbed, FNet, NqNet, RNet, SmallNetFuse
from lsfa_tpu.models.flownet import FlowNetS
from lsfa_tpu.models.layers import INIT01
from lsfa_tpu.models.resnet import ResNetBackbone
from lsfa_tpu.ops.warp import flow_warp


class LSFA(nn.Module):
    num_classes: int = 31
    # regression classes: 2 when CLASS_AGNOSTIC (bg + one fg set,
    # resnet_v1_101_flownet_rfcn.py:281), else num_classes
    num_reg_classes: int = 2
    feat_dim: int = 1024
    num_layer: int = 101
    nettype: str = "resnet"        # resnet | mobilenet | mobilenet_hobot
    num_anchors: int = 9
    # LSFA switches (shipped recipe defaults)
    add_dcn: bool = True
    rnet_num_conv: int = 0
    fnet_type: str = "None"
    fuse_type: str = "add"
    res_diff_bn: bool = False
    add_small_net: bool = True
    small_net_stride: int = 4
    small_net_fuse_type: str = "add"
    small_net_bn_before_fuse: bool = False
    small_net_scale_before_fuse: bool = False
    add_Nq_net: bool = True
    add_Fgfa_net: bool = False
    # ablation switches (no reference analog — see config.py): disable the
    # residual branch / the whole long-term aggregation stage
    add_rnet: bool = True
    add_lt_aggregation: bool = True
    anchor_means: Sequence[float] = (0.0, 0.0, 0.0, 0.0)
    anchor_stds: Sequence[float] = (0.1, 0.1, 0.4, 0.4)
    normalize_rpn: bool = True
    # on-device preprocessing: inputs are raw resized BGR frames (uint8 or
    # float); normalization happens on device so hosts ship 4x less data
    pixel_means: Sequence[float] = (0.0, 0.0, 0.0)   # BGR order
    pixel_scale: float = 1.0
    dtype: Any = jnp.float32

    def setup(self):
        # backbone trunk by nettype (resnet_v1_101_flownet_rfcn.py:33-40)
        if self.nettype == "resnet":
            dcn_u = (0, 1, 1, 3) if self.add_dcn else (0, 0, 0, 0)
            dcn_g = (0, 4, 4, 4) if self.add_dcn else (0, 0, 0, 0)
            self.backbone = ResNetBackbone(
                num_layer=self.num_layer, inv_resolution=16,
                deformable_units=dcn_u, num_deformable_group=dcn_g,
                dtype=self.dtype, name="backbone")
        elif self.nettype in ("mobilenet", "mobilenet_hobot"):
            if self.add_small_net:
                # the reference's MobileNet trunks have no need_part/
                # small-net plumbing either (SURVEY §2.2); fail loudly
                raise ValueError(
                    "add_small_net requires nettype='resnet' (the MobileNet"
                    " trunks expose no per-stage features — matching the"
                    " reference's mobilenetv2.py get_backbone contract)")
            if self.nettype == "mobilenet_hobot":
                # faithful Hobot trunk: unconditional t=1 expansion,
                # undilated stride-1 res5, 320-ch output, plain relu
                # (mobilenetv2_hobot.py:16-264)
                from lsfa_tpu.models.mobilenet import (
                    MobileNetV2HobotBackbone)
                self.backbone = MobileNetV2HobotBackbone(
                    inv_resolution=16, dtype=self.dtype, name="backbone")
            else:
                from lsfa_tpu.models.mobilenet import MobileNetV2Backbone
                self.backbone = MobileNetV2Backbone(
                    relu6=True, inv_resolution=16,
                    dtype=self.dtype, name="backbone")
        else:
            raise ValueError(f"unknown nettype: {self.nettype!r}")
        self.feat_conv_3x3 = nn.Conv(
            self.feat_dim, (3, 3), kernel_dilation=(6, 6), padding="SAME",
            dtype=self.dtype, name="feat_conv_3x3", kernel_init=INIT01)
        if self.add_lt_aggregation:
            self.flownet = FlowNetS(feat_dim=self.feat_dim, dtype=self.dtype,
                                    name="flownet")
        if self.add_rnet:
            self.rnet = RNet(num_conv=self.rnet_num_conv,
                             feat_dim=self.feat_dim,
                             use_bn=self.res_diff_bn, dtype=self.dtype,
                             name="rnet")
        self.fnet = FNet(fnet_type=self.fnet_type, feat_dim=self.feat_dim,
                         dtype=self.dtype, name="fnet")
        if self.add_Nq_net and self.add_lt_aggregation:
            self.aggregator = NqNet(dtype=self.dtype, name="nq_net")
        elif self.add_Fgfa_net and self.add_lt_aggregation:
            self.aggregator = FgfaEmbed(dtype=self.dtype, name="fgfa_net")
        else:
            self.aggregator = None
        if self.add_small_net:
            # the small net is a *copy* of the backbone's early stages
            # (separate params, initialized from the backbone at load time —
            # reference init_weight :754-760); only the needed stages run.
            self.small_backbone = ResNetBackbone(
                num_layer=self.num_layer, inv_resolution=16,
                num_stages=1 if self.small_net_stride == 4 else 2,
                dtype=self.dtype, name="small_net_backbone")
            self.small_fuse = SmallNetFuse(
                fuse_type=self.small_net_fuse_type, stride=self.small_net_stride,
                bn_before_fuse=self.small_net_bn_before_fuse,
                scale_before_fuse=self.small_net_scale_before_fuse,
                feat_dim=self.feat_dim, dtype=self.dtype, name="small_fuse")
        if self.fuse_type == "concat":
            self.fuse_downsample = nn.Conv(self.feat_dim, (1, 1),
                                           dtype=self.dtype, name="fuse_downsample", kernel_init=INIT01)
        # heads
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

    # ------- building blocks -------

    def preprocess(self, img_bgr):
        """Raw resized frame -> normalized RGB f32, on device.

        Two wire formats, dispatched statically on the trailing dim:
          (..., H, W, 3)     packed BGR u8/float — the device-side
                             replacement for lib/utils/image.py:296-308;
          (..., H*3/2, W, 1) planar I420 u8 (the C data plane's
                             payload_fmt="i420") — HALF the shipped
                             bytes; BT.601 limited-range YUV->RGB happens
                             here, fused into the normalization.
        Hosts ship uint8 either way (4x less tunnel/PCIe traffic than
        f32)."""
        if img_bgr.shape[-1] == 1:
            return self._preprocess_i420(img_bgr[..., 0])
        x = img_bgr.astype(jnp.float32)[..., ::-1]
        means = jnp.asarray(self.pixel_means, jnp.float32)[::-1]
        return (x - means) * self.pixel_scale

    def _preprocess_i420(self, packed):
        """Planar I420 (..., H*3/2, W) u8 -> normalized RGB f32 (..., H,
        W, 3). Matches swscale's MPEG-4 default (BT.601 limited range,
        nearest chroma upsampling); the C plane pads with Y=16 U=V=128 so
        the pad region converts to exact zeros like the BGR path — except
        the FIRST pad column/row when the scaled content width/height is
        odd: that pad texel shares its 4:2:0 chroma sample with the last
        content pixel (zeroing it would corrupt content chroma instead),
        so it converts to a chroma-only value. One texel wide, bounded by
        test_payload_fmt.py::test_i420_odd_width_pad_boundary."""
        h = packed.shape[-2] * 2 // 3
        w = packed.shape[-1]
        lead = packed.shape[:-2]
        y = packed[..., :h, :].astype(jnp.float32)
        u = packed[..., h:h + h // 4, :].reshape(lead + (h // 2, w // 2))
        v = packed[..., h + h // 4:, :].reshape(lead + (h // 2, w // 2))
        uv = jnp.stack([u, v], axis=-1).astype(jnp.float32) - 128.0
        uv = jnp.repeat(jnp.repeat(uv, 2, axis=-3), 2, axis=-2)
        yf = (y - 16.0) * 1.164384
        cb, cr = uv[..., 0], uv[..., 1]
        r = yf + 1.596027 * cr
        g = yf - 0.391762 * cb - 0.812968 * cr
        b = yf + 2.017232 * cb
        rgb = jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)
        means = jnp.asarray(self.pixel_means, jnp.float32)[::-1]
        return (rgb - means) * self.pixel_scale

    def conv_feat(self, ims, train: bool = False):
        """Backbone + shared dilated 3x3 -> the 1024-ch DFF feature
        (reference get_resnet_v1 :44-55)."""
        parts = self.backbone(ims, train)
        return nn.relu(self.feat_conv_3x3(parts[-1]))

    def long_term_aggregate(self, fresh_feat, old_feat, img_cur, img_old,
                            train: bool = False):
        """FlowNet warp of the previous key feature + quality-weighted
        fusion with the fresh feature (reference :305-315, :467-476).
        With add_lt_aggregation=False (ablation rung): the fresh feature
        passes through untouched — plain DFF key-frame behavior."""
        if not self.add_lt_aggregation:
            return fresh_feat
        flow, scale_map = self.flownet(img_cur, img_old)
        # flow (B, H/16, W/16, 2) in feature-cell units
        warped = flow_warp(old_feat, flow) * scale_map
        if self.aggregator is not None:
            return self.aggregator(warped, fresh_feat)
        return 0.5 * (warped + fresh_feat)

    def short_term_propagate(self, key_feat, motion_vector, res_diff,
                             cur_img=None, small_img=None,
                             train: bool = False):
        """MV warp + R-net residual mapping + optional small-net fusion
        (reference :319-336, :570-586).

        `small_img` (preprocessed, already 1/stride-downscaled) takes
        precedence over `cur_img` (full-res, downscaled on device) — at
        inference the host ships only the small image (~16x fewer pixels).
        """
        warped = flow_warp(key_feat, motion_vector)
        if not self.add_rnet:
            fused = warped               # ablation rung: pure MV warp
        else:
            r = self.rnet(res_diff, train)
            if self.fuse_type == "add":
                fused = warped + r
            elif self.fuse_type == "concat":
                fused = self.fuse_downsample(
                    jnp.concatenate([warped, r], axis=-1))
            else:
                raise ValueError(self.fuse_type)
        if "conv" in self.fnet_type:
            fused = self.fnet(fused)
        if self.add_small_net:
            if small_img is None:
                assert cur_img is not None
                small_img = self.small_fuse.downscale(cur_img)
            parts = self.small_backbone(small_img, train)
            small_feat = parts[0] if self.small_net_stride == 4 else parts[1]
            fused = self.small_fuse(fused, small_feat, train)
        return fused

    def rpn_head(self, rpn_feat):
        """RPN 1x1 convs. Returns (cls_logits (B,H,W,2A) [bg A | fg A],
        deltas (B,H,W,4A)) — reference channel layout (:344-347)."""
        cls = self.rpn_cls_score(rpn_feat).astype(jnp.float32)
        bbox = self.rpn_bbox_pred(rpn_feat).astype(jnp.float32)
        return cls, bbox

    def rfcn_maps(self, rfcn_feat):
        """Position-sensitive score/bbox maps (reference :397-399).

        Emitted in the model compute dtype: the values carry only that
        precision anyway, and psroi_pool runs its MXU contractions on
        bf16 operands with f32 accumulation — bit-identical to upcasting
        first (bf16 products are exact in f32) at a fraction of the cost."""
        return self.rfcn_cls(rfcn_feat), self.rfcn_bbox(rfcn_feat)

    def rpn_fg_probs(self, cls_logits):
        """Per-anchor fg probability from the [bg A | fg A] logit layout."""
        a = self.num_anchors
        shp = cls_logits.shape
        pair = jnp.stack([cls_logits[..., :a], cls_logits[..., a:]], axis=-1)
        probs = nn.softmax(pair, axis=-1)
        return probs[..., 1].reshape(shp[:-1] + (a,))

    def rpn_decode_deltas(self, deltas):
        """Un-normalize RPN deltas (reference rpn_inv_normalize op)."""
        if not self.normalize_rpn:
            return deltas
        std = jnp.tile(jnp.asarray(self.anchor_stds, jnp.float32), self.num_anchors)
        mean = jnp.tile(jnp.asarray(self.anchor_means, jnp.float32), self.num_anchors)
        return deltas * std + mean

    def _split(self, feat):
        half = self.feat_dim // 2
        return feat[..., :half], feat[..., half:]

    # ------- phase graphs -------

    def forward_train(self, data, data_ref, data_ref_old, eq_flag, eq_flag_old,
                      motion_vector, res_diff):
        """Training forward to the head maps (reference :277-341).

        All inputs batched (B leading); images are RAW resized BGR frames
        (uint8 or float) — normalization happens on device.
        eq_flag==1 means cur==key (use the fresh aggregated key feature
        directly); eq_flag_old==1 means old-ref==ref.
        """
        data = self.preprocess(data)
        data_ref = self.preprocess(data_ref)
        data_ref_old = self.preprocess(data_ref_old)
        b = data.shape[0]
        if not self.add_lt_aggregation:
            # ablation rung: the old-ref frame plays no role — skip its
            # backbone pass entirely
            key_feat = self.conv_feat(data_ref, train=True)
        else:
            both = jnp.concatenate([data_ref, data_ref_old], axis=0)
            feats = self.conv_feat(both, train=True)
            feat_ref, feat_old = feats[:b], feats[b:]
            feat_prop = self.long_term_aggregate(
                feat_ref, feat_old, data_ref, data_ref_old, train=True)
            # ChooseFeat (reference operator_py/choose_feat.py): fresh
            # feature when the pair is degenerate (cur==key or old==ref),
            # else aggregated
            use_fresh = ((eq_flag > 0) | (eq_flag_old > 0)).reshape(b, 1, 1, 1)
            key_feat = jnp.where(use_fresh, feat_ref, feat_prop)

        cur_feat = self.short_term_propagate(key_feat, motion_vector, res_diff,
                                             cur_img=data, train=True)
        # take(concat(cur_feat, key_feat), eq_flag): key frames train the
        # key path directly (reference :338)
        is_key = (eq_flag > 0).reshape(b, 1, 1, 1)
        sel = jnp.where(is_key, key_feat, cur_feat)

        rpn_feat, rfcn_feat = self._split(sel)
        rpn_cls, rpn_bbox = self.rpn_head(rpn_feat)
        cls_map, bbox_map = self.rfcn_maps(rfcn_feat)
        return {
            "rpn_cls": rpn_cls, "rpn_bbox": rpn_bbox,
            "rfcn_cls_map": cls_map, "rfcn_bbox_map": bbox_map,
            "key_feat": key_feat, "sel_feat": sel,
        }

    def forward_key(self, data, data_key_old, feat_key_old, is_first):
        """Key-frame inference (reference get_key_test_symbol :448-551).

        `data` is the RAW resized BGR frame; `data_key_old` is the CACHED
        preprocessed previous key frame (a device-resident tensor the
        caller got back from the previous key step — never re-shipped).
        is_first: (B,) — on the first frame of a stream the cached old
        feature is a dummy; substitute the fresh feature
        (ChooseOldKeyFeat, operator_py/choose_old_key_feat.py).
        """
        data = self.preprocess(data)
        b = data.shape[0]
        fresh = self.conv_feat(data, train=False)
        first = (is_first > 0).reshape(b, 1, 1, 1)
        old = jnp.where(first, fresh, feat_key_old)
        prop = self.long_term_aggregate(fresh, old, data, data_key_old, train=False)
        # the streaming feature cache is f32 by design (bf16 recurrence was
        # a recorded accuracy regression, DESIGN.md); cast explicitly — with
        # add_lt_aggregation=False the bf16 backbone output would otherwise
        # flow straight into the f32 scan carry and fail to trace
        feat = jnp.where(first, fresh, prop).astype(jnp.float32)
        rpn_feat, rfcn_feat = self._split(feat)
        rpn_cls, rpn_bbox = self.rpn_head(rpn_feat)
        cls_map, bbox_map = self.rfcn_maps(rfcn_feat)
        return {
            "feat": feat,
            "prep": data,
            "rpn_fg": self.rpn_fg_probs(rpn_cls),
            "rpn_deltas": self.rpn_decode_deltas(rpn_bbox),
            "rfcn_cls_map": cls_map, "rfcn_bbox_map": bbox_map,
        }

    def forward_cur(self, small_img, feat_key, motion_vector, res_diff):
        """Non-key inference (reference get_cur_test_symbol :553-659) —
        no backbone, no flownet: MV warp + R-net + small net only.
        `small_img` is the RAW already-downscaled (1/small_net_stride) BGR
        frame — the full-resolution image never reaches the device."""
        feat = self.short_term_propagate(
            feat_key, motion_vector, res_diff,
            small_img=self.preprocess(small_img), train=False)
        rpn_feat, rfcn_feat = self._split(feat)
        rpn_cls, rpn_bbox = self.rpn_head(rpn_feat)
        cls_map, bbox_map = self.rfcn_maps(rfcn_feat)
        return {
            "feat": feat,
            "rpn_fg": self.rpn_fg_probs(rpn_cls),
            "rpn_deltas": self.rpn_decode_deltas(rpn_bbox),
            "rfcn_cls_map": cls_map, "rfcn_bbox_map": bbox_map,
        }

    def forward_batch_gop(self, data_key, data_other):
        """Batched-GOP inference (reference get_batch_test_symbol :661-751):
        one key frame + N-1 non-key frames in a single forward, DFF-style
        (flow warp only). data_key: (1, H, W, 3); data_other: (N-1, H, W, 3),
        both RAW resized BGR."""
        data_key = self.preprocess(data_key)
        data_other = self.preprocess(data_other)
        feat_key = self.conv_feat(data_key, train=False)
        n = data_other.shape[0]
        key_t = jnp.broadcast_to(feat_key, (n,) + feat_key.shape[1:])
        img_key_t = jnp.broadcast_to(data_key, (n,) + data_key.shape[1:])
        flow, scale_map = self.flownet(data_other, img_key_t)
        feat_other = flow_warp(key_t, flow) * scale_map
        feat = jnp.concatenate([feat_key, feat_other], axis=0)
        rpn_feat, rfcn_feat = self._split(feat)
        rpn_cls, rpn_bbox = self.rpn_head(rpn_feat)
        cls_map, bbox_map = self.rfcn_maps(rfcn_feat)
        return {
            "feat": feat,
            "rpn_fg": self.rpn_fg_probs(rpn_cls),
            "rpn_deltas": self.rpn_decode_deltas(rpn_bbox),
            "rfcn_cls_map": cls_map, "rfcn_bbox_map": bbox_map,
        }

    def __call__(self, data, data_ref, data_ref_old, eq_flag, eq_flag_old,
                 motion_vector, res_diff):
        """Default apply = train forward. Used for init: it traces every
        submodule (backbone, flownet, aggregator, R-net, small net, heads)
        so one init covers all phase graphs."""
        return self.forward_train(data, data_ref, data_ref_old, eq_flag,
                                  eq_flag_old, motion_vector, res_diff)


def lsfa_from_config(cfg):
    """Build an LSFA module from a config tree."""
    n = cfg.network
    return LSFA(
        num_classes=cfg.dataset.NUM_CLASSES,
        num_reg_classes=2 if cfg.CLASS_AGNOSTIC else cfg.dataset.NUM_CLASSES,
        feat_dim=n.DFF_FEAT_DIM,
        num_layer=n.num_layer,
        nettype=str(n.nettype),
        num_anchors=n.NUM_ANCHORS,
        add_dcn=n.add_dcn,
        rnet_num_conv=n.rnet_num_conv,
        fnet_type=str(n.fnet_type),
        fuse_type=n.fuse_type,
        res_diff_bn=n.res_diff_bn,
        add_small_net=n.add_small_net,
        small_net_stride=n.small_net_stride,
        small_net_fuse_type=n.small_net_fuse_type,
        small_net_bn_before_fuse=n.small_net_bn_before_fuse,
        small_net_scale_before_fuse=n.small_net_scale_before_fuse,
        add_Nq_net=n.add_Nq_net,
        add_Fgfa_net=n.add_Fgfa_net,
        add_rnet=bool(getattr(n, "add_rnet", True)),
        add_lt_aggregation=bool(getattr(n, "add_lt_aggregation", True)),
        anchor_means=tuple(n.ANCHOR_MEANS),
        anchor_stds=tuple(n.ANCHOR_STDS),
        normalize_rpn=n.NORMALIZE_RPN,
        pixel_means=tuple(float(m) for m in n.PIXEL_MEANS),
        pixel_scale=float(n.PIXEL_SCALE),
        dtype=jnp.bfloat16 if cfg.tpu.compute_dtype == "bfloat16" else jnp.float32,
    )
