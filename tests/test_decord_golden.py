"""Golden decord-arithmetic parity (RUNBOOK "Unverified #3", closed here to
the extent possible offline).

The reference's fps->num_frames->uniform-index pipeline
(/root/reference/llava/model/multimodal_encoder/languagebind/video/
processing_video.py:97-110, decord branch) defines WHICH frames the
released checkpoints were trained on. ``_reference_frame_ids`` below is a
LITERAL transcription of that arithmetic — deliberately not routed through
this repo's helpers — and every case asserts our ``fps_num_frames`` +
``sample_indices_uniform`` (and the decode backends' actual frame content)
reproduce it exactly.
"""

import math
import os

import numpy as np
import pytest

import conftest as _c  # noqa: F401

from videollamb_tpu.data.video_reader import (
    fps_num_frames,
    load_video,
    probe_video,
    sample_indices_uniform,
)


def _reference_frame_ids(duration, avg_fps, fps=None, num_frames=8,
                         max_frames=512):
    """Verbatim transcription of processing_video.py:97-110:

        duration = len(decord_vr)
        if fps:
            avg_fps = decord_vr.get_avg_fps()
            secs = duration / avg_fps
            new_duration = math.ceil(secs * fps)
            num_frames = max(8, new_duration-new_duration%8)
            num_frames = min(num_frames, 512)
        frame_id_list = np.linspace(0, duration-1, num_frames, dtype=int)
    """
    if fps:
        secs = duration / avg_fps
        new_duration = math.ceil(secs * fps)
        num_frames = max(8, new_duration - new_duration % 8)
        num_frames = min(num_frames, max_frames)
    frame_id_list = np.linspace(0, duration - 1, num_frames, dtype=int)
    return num_frames, frame_id_list


# (total_frames, avg_fps, target_fps) battery: short clips below the 8-frame
# floor, NTSC fractional rates, exact multiples of 8, the 512 cap, hour-scale
# streams, and 1-frame degenerates.
FPS_CASES = [
    (90, 30.0, 1.0),        # 3 s -> floor of 8
    (3000, 30.0, 1.0),      # 100 s -> 96
    (18000, 30.0, 1.0),     # 600 s -> cap 512
    (108000, 30.0, 1.0),    # 1 h -> cap 512
    (239, 29.97, 1.0),      # NTSC: 7.974 s -> ceil 8 -> 8
    (240, 29.97, 1.0),      # 8.008 s -> ceil 9 -> 9-1=8
    (480, 29.97, 1.0),      # 16.016 s -> ceil 17 -> 16
    (256, 32.0, 1.0),       # exactly 8 s -> 8
    (257, 32.0, 1.0),       # 8.03 s -> ceil 9 -> 8
    (750, 25.0, 2.0),       # 30 s @ 2 fps -> 60 -> 56
    (1, 30.0, 1.0),         # 1-frame video -> floor of 8 repeated indices
    (7, 24.0, 1.0),         # sub-second
    (16383, 30.0, 1.0),     # 546.1 s -> ceil 547 -> 544 -> capped? 544 > 512
    (12287, 23.976, 3.0),   # fractional rate, fps 3
]


@pytest.mark.parametrize("total,avg_fps,fps", FPS_CASES)
def test_fps_budget_matches_reference(total, avg_fps, fps):
    want_n, want_ids = _reference_frame_ids(total, avg_fps, fps=fps)
    got_n = fps_num_frames(total, avg_fps, fps)
    assert got_n == want_n
    got_ids = sample_indices_uniform(total, got_n)
    np.testing.assert_array_equal(got_ids, want_ids)


@pytest.mark.parametrize("total,num", [
    (90, 8), (8, 8), (7, 8), (1, 8), (512, 16), (100, 100), (3, 16),
    (511, 512), (2, 3),
])
def test_uniform_indices_match_reference(total, num):
    _, want = _reference_frame_ids(total, None, fps=None, num_frames=num)
    got = sample_indices_uniform(total, num)
    np.testing.assert_array_equal(got, want)


def test_reference_indices_never_out_of_range():
    rng = np.random.default_rng(0)
    for _ in range(200):
        total = int(rng.integers(1, 20000))
        avg_fps = float(rng.uniform(10.0, 60.0))
        fps = float(rng.choice([0.5, 1.0, 2.0, 3.0]))
        want_n, want_ids = _reference_frame_ids(total, avg_fps, fps=fps)
        got_n = fps_num_frames(total, avg_fps, fps)
        assert got_n == want_n
        got = sample_indices_uniform(total, got_n)
        np.testing.assert_array_equal(got, want_ids)
        assert got.min() >= 0 and got.max() <= total - 1


# ---------------------------------------------------------------------------
# Frame CONTENT parity: the decoded frames really are the reference indices.
# ---------------------------------------------------------------------------

def _index_frame(i, w=64, h=48, bits=8):
    """Frame encoding its index as 8 high-contrast binary columns (flat
    gray ramps are useless here: mp4v quantizes a 2-level/frame delta to
    zero and drifts a whole frame behind)."""
    f = np.zeros((h, w, 3), np.uint8)
    col = w // bits
    for b in range(bits):
        if (i >> b) & 1:
            f[:, b * col:(b + 1) * col] = 255
    return f


def _decode_index(frame, bits=8):
    h, w = frame.shape[:2]
    col = w // bits
    idx = 0
    for b in range(bits):
        # Column centers dodge block-boundary ringing.
        patch = frame[h // 4: 3 * h // 4,
                      b * col + col // 4: (b + 1) * col - col // 4]
        if patch.mean() > 127:
            idx |= 1 << b
    return idx


@pytest.fixture(scope="module")
def indexed_video(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path_factory.mktemp("golden") / "idx.mp4")
    w, h, n, rate = 64, 48, 120, 30
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), rate, (w, h))
    for i in range(n):
        writer.write(_index_frame(i, w, h))
    writer.release()
    return path, n, rate


@pytest.mark.parametrize("backend", ["native", "cv2"])
def test_decoded_content_matches_reference_indices(indexed_video, backend):
    path, n, rate = indexed_video
    total, avg_fps = probe_video(path)
    assert total == n
    want_n, want_ids = _reference_frame_ids(total, avg_fps, fps=1.0)
    frames = load_video(path, fps=1.0, backend=backend)
    assert frames.shape[0] == want_n
    decoded_idx = [_decode_index(f) for f in frames]
    np.testing.assert_array_equal(decoded_idx, want_ids)
