"""Round-trip tests of the native compressed-video loader.

The clip is synthesized by the library itself (MPEG-4, GOP 12), then
decoded back — the reconstruction test is the reference's own
check_reconstruction oracle (lib/utils/image.py:79-89)."""

import numpy as np
import pytest

from lsfa_tpu.data import coviar
from lsfa_tpu.data.image import check_reconstruction

pytestmark = pytest.mark.skipif(not coviar.available(),
                                reason="libcoviar_tpu.so not built")


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("vid") / "test.mp4")
    coviar.encode_test_video(p, n_frames=30, w=128, h=96, gop_size=12, seed=1)
    return p


def test_stream_structure(clip):
    assert coviar.get_num_frames(clip) == 30
    # 30 frames at GOP 12 -> 3 GOPs (12 + 12 + 6)
    assert coviar.get_num_gops(clip) == 3
    r = coviar.VideoReader(clip)
    assert (r.width, r.height) == (128, 96)
    assert r.gop_frames(0) == 12
    assert r.gop_frames(2) == 6


def test_image_decode(clip):
    im = coviar.load(clip, 0, 0, 0)
    assert im.shape == (96, 128, 3) and im.dtype == np.uint8
    im2 = coviar.load(clip, 1, 3, 0)
    assert im2.shape == (96, 128, 3)
    assert not np.array_equal(im, im2)


def test_key_frame_has_zero_mv_res(clip):
    mv = coviar.load(clip, 1, 0, 1)
    res = coviar.load(clip, 1, 0, 2)
    assert (mv == 0).all() and (res == 0).all()


def test_reconstruction_exact(clip):
    """key[p - mv] + res == cur, pixel-exact, for every non-key frame."""
    for gop in (0, 1):
        key = coviar.load(clip, gop, 0, 0).astype(np.int64)
        for pos in (1, 5, 11):
            im = coviar.load(clip, gop, pos, 0).astype(np.int64)
            mv = coviar.load(clip, gop, pos, 1)
            res = coviar.load(clip, gop, pos, 2)
            assert check_reconstruction(key, im, mv, res), (gop, pos)


def test_motion_vectors_nontrivial(clip):
    """The synthesized clip has real motion; MVs must not be all zero."""
    total = 0
    for pos in (3, 6, 9):
        total += int(np.abs(coviar.load(clip, 0, pos, 1)).sum())
    assert total > 0


def test_gop_decode_batch(clip):
    r = coviar.VideoReader(clip)
    bgr, mv, res = r.decode_gop(1)
    assert bgr.shape == (12, 96, 128, 3)
    assert mv.shape == (12, 96, 128, 2)
    assert res.shape == (12, 96, 128, 3)
    np.testing.assert_array_equal(bgr[4], coviar.load(clip, 1, 4, 0))


def test_bframe_stream_refused(tmp_path):
    """A stream with B-frames breaks presentation==decode order; the loader
    must refuse to open it rather than silently mis-index frames."""
    from lsfa_tpu.data import coviar
    import pytest as _pytest
    if not coviar.available():
        _pytest.skip("native loader not built")
    p = str(tmp_path / "bframes.mp4")
    coviar.encode_test_video(p, n_frames=24, w=64, h=48, gop_size=12,
                             seed=1, b_frames=2)
    with _pytest.raises(IOError, match="cannot open"):
        coviar.VideoReader(p)
