from lsfa_tpu.train.anchor_assign import assign_anchors  # noqa: F401
from lsfa_tpu.train.proposal_target import proposal_target  # noqa: F401
from lsfa_tpu.train.ohem import ohem_select  # noqa: F401
from lsfa_tpu.train.losses import (  # noqa: F401
    smooth_l1,
    softmax_ce_ignore,
)
