"""Time-multiplexed multistream eval (VERDICT r4 item 4).

eval_videos_timeplex round-robins windows from N streams through the ONE
single-lane GOP-scan program, swapping each stream's device-resident
carry between dispatches. Detections must be IDENTICAL to eval_videos
over the same records — only the dispatch order interleaves.
"""

import logging

import numpy as np
import pytest

from lsfa_tpu.config import load_config
from lsfa_tpu.data import coviar
from lsfa_tpu.data.synth import make_synth_vid_dataset
from lsfa_tpu.eval.driver import eval_videos, eval_videos_timeplex
from lsfa_tpu.train.driver import init_model

pytestmark = pytest.mark.skipif(not coviar.available(),
                                reason="native coviar plane not built")


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    d = tmp_path_factory.mktemp("timeplex")
    # 3 videos x 36 frames (3 GOPs) + 1 video with a partial-GOP tail
    _, vids, _ = make_synth_vid_dataset(
        str(d), n_videos=3, n_frames=36, seed=11, sizes=((128, 96),),
        gop_size=12, split="val", profile="easy")
    _, tail, _ = make_synth_vid_dataset(
        str(d), n_videos=1, n_frames=30, seed=12, sizes=((128, 96),),
        gop_size=12, split="val", profile="easy")
    roidb = vids + tail
    cfg = load_config("configs/lsfa_tiny_smoke.yaml")
    model, params, bs = init_model(cfg)
    return cfg, model, {"params": params, "batch_stats": bs}, roidb


def _det_equal(a, b):
    assert set(a.keys()) == set(b.keys())
    for k in a:
        np.testing.assert_array_equal(a[k]["labels"], b[k]["labels"])
        np.testing.assert_allclose(a[k]["scores"], b[k]["scores"],
                                   rtol=1e-6)
        np.testing.assert_allclose(a[k]["boxes"], b[k]["boxes"],
                                   rtol=1e-5, atol=1e-3)


def test_timeplex_matches_sequential(env):
    cfg, model, variables, roidb = env
    logger = logging.getLogger("timeplex")
    logger.addHandler(logging.NullHandler())
    ref = eval_videos(model, variables, cfg, roidb, logger=logger)
    tp = eval_videos_timeplex(model, variables, cfg, roidb, streams=2,
                              logger=logger)
    assert len(ref) == 3 * 36 + 30
    _det_equal(ref, tp)


def test_timeplex_more_streams_than_videos(env):
    cfg, model, variables, roidb = env
    logger = logging.getLogger("timeplex")
    logger.addHandler(logging.NullHandler())
    ref = eval_videos(model, variables, cfg, roidb[:1], logger=logger)
    tp = eval_videos_timeplex(model, variables, cfg, roidb[:1],
                              streams=8, logger=logger)
    _det_equal(ref, tp)
