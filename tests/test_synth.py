"""Hardened synthetic-VID generator (data/synth.py).

The hard profile is the benchmark the ablation ladder separates on
(VERDICT r3 item 2): occluders must actually drop annotations, distractors
must paint but never annotate, camera zoom must change object scale, and
the low-bitrate encode must still round-trip the native decode path.
"""

import os

import numpy as np
import pytest

from lsfa_tpu.data.synth import (HARD_PROFILE, NUM_SYNTH_CLASSES,
                                 make_synth_vid_dataset, render_video)

HARD = dict(n_distractors=3, occluders=2, zoom=0.15, pan_speed=3.0,
            size_range=(0.035, 0.20), motion_blur=True, flicker=0.08,
            speed=9.0, min_visibility=0.25)


def test_easy_defaults_annotate_every_painted_object():
    rng = np.random.default_rng(1)
    frames, annos = render_video(128, 96, 12, rng)
    assert frames.shape == (12, 96, 128, 3) and frames.dtype == np.uint8
    assert all(len(a) >= 1 for a in annos)
    for boxes in annos:
        for box, cls in boxes:
            x1, y1, x2, y2 = box
            assert 0 <= x1 < x2 < 128 and 0 <= y1 < y2 < 96
            assert 1 <= cls <= NUM_SYNTH_CLASSES


def test_occlusion_drops_boxes_sometimes():
    # across seeds, some frame must lose an annotation to an occluder
    # (min_visibility) while others keep all objects
    saw_drop = False
    for seed in range(8):
        rng = np.random.default_rng(seed)
        _, annos = render_video(320, 192, 30, rng, 2, 4, **HARD)
        counts = [len(a) for a in annos]
        if max(counts) > min(counts):
            saw_drop = True
            break
    assert saw_drop, "occluders never dropped a box across 8 seeds"


def test_distractors_paint_but_do_not_annotate():
    # a video with ONLY distractors (0 objects) has zero annotations but
    # non-background pixels beyond the textured background
    rng = np.random.default_rng(3)
    frames, annos = render_video(192, 128, 8, rng, 0, 0, n_distractors=4)
    assert all(len(a) == 0 for a in annos)
    rng2 = np.random.default_rng(3)
    plain, _ = render_video(192, 128, 8, rng2, 0, 0, n_distractors=0)
    # distractor painting consumed extra rng draws so backgrounds differ;
    # compare painted-pixel "objectness" instead: distractor frames have
    # many more saturated pixels than pure background frames
    assert (np.abs(frames.astype(int) - np.median(frames)) > 80).mean() > \
        (np.abs(plain.astype(int) - np.median(plain)) > 80).mean()


def test_zoom_changes_object_scale():
    # track one object's box area over a zoom cycle: with zoom it must
    # vary more than the size-wobble alone explains
    def area_spread(zoom):
        rng = np.random.default_rng(7)
        _, annos = render_video(320, 192, 60, rng, 1, 1, zoom=zoom,
                                pan_speed=0.0, speed=0.0)
        areas = [(b[2] - b[0]) * (b[3] - b[1]) for a in annos
                 for b, _ in a]
        areas = np.asarray(areas)
        return float(areas.max() / max(areas.min(), 1.0))

    assert area_spread(0.25) > area_spread(0.0) * 1.3


def test_hard_profile_dataset_roundtrip(tmp_path):
    from lsfa_tpu.data import coviar

    if coviar._lib() is None:
        pytest.skip("native coviar lib unavailable")
    fr, vr, annos = make_synth_vid_dataset(
        str(tmp_path), n_videos=2, n_frames=24, seed=11,
        sizes=((192, 128), (128, 192)), profile="hard")
    assert len(fr) == 48 and len(vr) == 2 and len(annos) == 48
    vp = vr[0]["video_path"]
    assert coviar.get_num_frames(vp) == 24
    im = coviar.load(vp, 1, 5, 0, True)
    assert im.shape == (128, 192, 3)
    mv = coviar.load(vp, 1, 5, 1, True)
    assert np.abs(mv).max() > 0, "hard clips must carry real motion vectors"
    # the hard profile's knob hash must produce a distinct cache tag from
    # the easy profile at identical geometry
    fr2, vr2, _ = make_synth_vid_dataset(
        str(tmp_path), n_videos=2, n_frames=24, seed=11,
        sizes=((192, 128), (128, 192)))
    assert vr2[0]["video_path"] != vp


def test_explicit_knobs_override_profile(tmp_path):
    from lsfa_tpu.data import coviar

    if coviar._lib() is None:
        pytest.skip("native coviar lib unavailable")
    # same geometry + profile but a different bitrate must re-encode
    _, vr_a, _ = make_synth_vid_dataset(
        str(tmp_path), n_videos=1, n_frames=12, seed=2,
        sizes=((192, 128),), profile="hard")
    _, vr_b, _ = make_synth_vid_dataset(
        str(tmp_path), n_videos=1, n_frames=12, seed=2,
        sizes=((192, 128),), profile="hard", bit_rate=2_000_000)
    assert vr_a[0]["video_path"] != vr_b[0]["video_path"]
    # (encoded size is NOT asserted: MPEG-4 single-pass rate control does
    # not bind on 12-frame clips this small)
    assert os.path.getsize(vr_a[0]["video_path"]) > 0
    assert HARD_PROFILE["bit_rate"] < 2_000_000
