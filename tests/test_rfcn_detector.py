import numpy as np
import jax
import jax.numpy as jnp

from lsfa_tpu.config import get_default_config
from lsfa_tpu.eval.rfcn_tester import RFCNDetector
from lsfa_tpu.models.rfcn import RFCN

H, W = 64, 96


def test_rfcn_detector_end_to_end():
    cfg = get_default_config()
    cfg.dataset.NUM_CLASSES = 5
    cfg.network.DFF_FEAT_DIM = 64
    cfg.network.num_layer = 18
    cfg.TEST.RPN_PRE_NMS_TOP_N = 128
    cfg.TEST.RPN_POST_NMS_TOP_N = 32
    cfg.TEST.max_per_image = 10
    model = RFCN(num_classes=5, feat_dim=64, num_layer=18)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    det = RFCNDetector(model, v, cfg, (H, W))
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (1, H, W, 3), dtype=np.uint8)
    im_info = np.asarray([[H * 1.0, W * 1.0, 1.0]], np.float32)
    d, valid = det.detect(frame, im_info)
    d = np.asarray(d)
    assert d.shape == (10, 6)
    assert np.isfinite(d).all()
    # deterministic across calls (stateless)
    d2, _ = det.detect(frame, im_info)
    np.testing.assert_array_equal(d, np.asarray(d2))
