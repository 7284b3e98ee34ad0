from lsfa_tpu.ops.boxes import (  # noqa: F401
    bbox_transform,
    bbox_pred,
    clip_boxes,
    box_area,
    pairwise_iou,
)
from lsfa_tpu.ops.anchors import generate_anchors, anchor_grid  # noqa: F401
from lsfa_tpu.ops.nms import nms_fixed  # noqa: F401
from lsfa_tpu.ops.proposal import rpn_proposals  # noqa: F401
from lsfa_tpu.ops.warp import flow_warp  # noqa: F401
from lsfa_tpu.ops.psroi_pool import psroi_pool  # noqa: F401
