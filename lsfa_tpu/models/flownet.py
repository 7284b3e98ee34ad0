"""FlowNet-S flow estimator with the DFF scale map (flax.linen, NHWC).

Behavioral target: get_flownet
(dff_rfcn/symbols/resnet_v1_101_flownet_rfcn.py:150-207):
  * inputs are the two images (0..255-mean), divided by 255 and channel-
    concatenated, then average-pooled 2x2 (half-res trunk),
  * 6 conv stages (64/128/256/512/512/1024, leaky-relu 0.1) with the
    FlowNet-S refinement: per-level 3x3 flow prediction, 4x4/s2 deconvs of
    features and flows, skip concatenation, down to 1/8 of the half-res
    input (= 1/16 of the full image after the final 2x2 avg pool),
  * returns (flow * 2.5, scale_map) where scale_map is a 1024-channel 1x1
    conv of the final feature, initialized to constant 1 (weight 0, bias 1,
    reference init at :869-870) so warping starts as identity-scaled.

Flow channel order is (dx, dy) to feed ops.warp.flow_warp directly.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from lsfa_tpu.models.layers import avg_pool, deconv_x2, leaky_relu


class FlowNetS(nn.Module):
    feat_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img_cur, img_ref):
        dt = self.dtype

        def cv(x, f, k, s, name):
            # explicit symmetric MXNet pad (k//2) — see layers.mx_pad; the
            # reference pads (3,3)/(2,2)/(1,1) for k=7/5/3 (get_flownet)
            p = k // 2
            return nn.Conv(f, (k, k), strides=(s, s), padding=((p, p), (p, p)),
                           name=name, dtype=dt)(x)

        # cast to the compute dtype BEFORE the /255 + concat + pool chain:
        # these are the largest activations in the whole key step (full-res
        # x 6 channels); in f32 they showed up as four ~45 MB layout
        # transposes in the r4 xplane (ROADMAP r4 ladder note). bf16
        # carries the 0..255/255 range exactly enough for a flow trunk
        # that immediately computes in bf16 anyway.
        x = jnp.concatenate([img_cur.astype(dt), img_ref.astype(dt)],
                            axis=-1) / jnp.asarray(255.0, dt)
        x = avg_pool(x, 2)                                   # half resolution
        c1 = leaky_relu(cv(x, 64, 7, 2, "conv1"))            # 1/4
        c2 = leaky_relu(cv(c1, 128, 5, 2, "conv2"))          # 1/8
        c3 = leaky_relu(cv(c2, 256, 5, 2, "conv3"))          # 1/16
        c3b = leaky_relu(cv(c3, 256, 3, 1, "conv3_1"))
        c4 = leaky_relu(cv(c3b, 512, 3, 2, "conv4"))         # 1/32
        c4b = leaky_relu(cv(c4, 512, 3, 1, "conv4_1"))
        c5 = leaky_relu(cv(c4b, 512, 3, 2, "conv5"))         # 1/64
        c5b = leaky_relu(cv(c5, 512, 3, 1, "conv5_1"))
        c6 = leaky_relu(cv(c5b, 1024, 3, 2, "conv6"))        # 1/128
        c6b = leaky_relu(cv(c6, 1024, 3, 1, "conv6_1"))

        def crop_to(x, ref):
            return x[..., : ref.shape[-3], : ref.shape[-2], :]

        def refine(feat, skip, up_feats, flow, lvl):
            """deconv feat + upsample flow, concat with skip."""
            d = leaky_relu(crop_to(deconv_x2(feat, up_feats, name=f"deconv{lvl}",
                                             dtype=dt), skip))
            uf = crop_to(deconv_x2(flow, 2, name=f"upflow{lvl}", dtype=dt), skip)
            return jnp.concatenate([skip, d, uf], axis=-1)

        flow6 = cv(c6b, 2, 3, 1, "flow6")
        cat5 = refine(c6b, c5b, 512, flow6, 5)
        flow5 = cv(cat5, 2, 3, 1, "flow5")
        cat4 = refine(cat5, c4b, 256, flow5, 4)
        flow4 = cv(cat4, 2, 3, 1, "flow4")
        cat3 = refine(cat4, c3b, 128, flow4, 3)
        flow3 = cv(cat3, 2, 3, 1, "flow3")
        cat2 = refine(cat3, c2, 64, flow3, 2)
        cat2 = avg_pool(cat2, 2)                             # 1/16 of full image

        flow = cv(cat2, 2, 3, 1, "flow_final").astype(jnp.float32) * 2.5
        scale_map = nn.Conv(
            self.feat_dim, (1, 1),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.ones,
            name="scale_map", dtype=dt,
        )(cat2)
        return flow, scale_map
