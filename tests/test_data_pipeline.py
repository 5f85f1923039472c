"""Data layer tests: video reading (native + cv2 backends), frame-budget
math, transforms, tokenizer splicing, conversation prompts."""

import os

import numpy as np
import pytest

import conftest as _c  # noqa: F401

from videollamb_tpu.constants import VIDEO_TOKEN_INDEX
from videollamb_tpu.conversation import conv_templates
from videollamb_tpu.data.processing import ImageProcessor, VideoProcessor
from videollamb_tpu.data.video_reader import (
    fps_num_frames,
    load_video,
    sample_indices_uniform,
)
from videollamb_tpu.mm_utils import tokenizer_x_token


@pytest.fixture(scope="module")
def test_video(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path_factory.mktemp("vid") / "t.mp4")
    w, h, n = 64, 48, 90
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
    for i in range(n):
        f = np.zeros((h, w, 3), np.uint8)
        f[:, :, 0] = min(i * 3, 255)
        writer.write(f)
    writer.release()
    return path


def test_fps_num_frames_reference_math():
    # 90 frames @30fps = 3s; 1 fps target -> ceil(3)=3 -> max(8, 3-3%8=0)=8
    assert fps_num_frames(90, 30.0, 1.0) == 8
    # 600s * 1fps = 600 -> 600 - 600%8 = 600 -> capped at 512
    assert fps_num_frames(18000, 30.0, 1.0) == 512
    # 100s * 1fps = 100 -> 96
    assert fps_num_frames(3000, 30.0, 1.0) == 96


def test_load_video_backends_agree(test_video):
    native = load_video(test_video, num_frames=8, backend="native")
    cv2_out = load_video(test_video, num_frames=8, backend="cv2")
    assert native.shape == cv2_out.shape == (8, 48, 64, 3)
    assert np.abs(native.astype(int) - cv2_out.astype(int)).mean() < 1.0


def test_video_processor_shapes_and_stats(test_video):
    frames = load_video(test_video, num_frames=8)
    proc = VideoProcessor()
    out = proc(frames)
    assert out.shape == (8, 3, 224, 224)
    # Normalization: a mid-gray frame maps near (0.5-mean)/std.
    gray = np.full((2, 10, 10, 3), 128, np.uint8)
    out = VideoProcessor(size=8)(gray)
    expected = (128 / 255.0 - 0.48145466) / 0.26862954
    np.testing.assert_allclose(out[0, 0], expected, atol=1e-5)


def test_image_processor_shape():
    img = np.random.default_rng(0).integers(0, 255, size=(100, 160, 3)).astype(np.uint8)
    out = ImageProcessor()(img)
    assert out.shape == (3, 224, 224)


class FakeTokenizer:
    bos_token_id = 1

    def __call__(self, text):
        class R:
            pass

        r = R()
        # bos + one token per word
        r.input_ids = [1] + [100 + len(w) for w in text.split()] if text else [1]
        return r


def test_tokenizer_x_token_splice():
    tok = FakeTokenizer()
    ids = tokenizer_x_token("hello world <video> tail", tok, VIDEO_TOKEN_INDEX)
    # bos, hello, world, SENTINEL, tail
    assert ids[0] == 1
    assert VIDEO_TOKEN_INDEX in ids
    assert ids.count(VIDEO_TOKEN_INDEX) == 1
    sent = ids.index(VIDEO_TOKEN_INDEX)
    assert sent == 3 and len(ids) == 5


def test_conversation_v1_prompt_format():
    conv = conv_templates["llava_v1"].copy()
    conv.append_message(conv.roles[0], "<video>\nWhat is happening?")
    conv.append_message(conv.roles[1], None)
    prompt = conv.get_prompt()
    assert prompt.startswith("A chat between a curious human")
    assert "USER: <video>\nWhat is happening? ASSISTANT:" in prompt


def test_conversation_plain_prompt():
    # plain template: bare concatenation with sep (sep2 is None, as in the
    # reference registry — multi-turn plain prompts go through
    # preprocess_plain, not get_prompt).
    conv = conv_templates["plain"].copy()
    conv.append_message(conv.roles[0], "<video>")
    assert conv.get_prompt() == "<video>\n"


def test_stage_timer_and_logging_utils():
    import time as _time

    from videollamb_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.stage("decode"):
        _time.sleep(0.01)
    with t.stage("decode"):
        pass
    s = t.summary()
    assert s["decode"]["count"] == 2 and s["decode"]["total_s"] >= 0.01
    assert "decode" in t.report()


def test_keyword_stopper_trim():
    from videollamb_tpu.mm_utils import KeywordStopper

    class Tok:
        bos_token_id = 1

        def __call__(self, text):
            class R: pass
            r = R(); r.input_ids = [1, 42]
            return r

    st = KeywordStopper(["</s>"], Tok())
    assert st.trim("hello world</s>garbage") == "hello world"
    assert st.trim("no stop here") == "no stop here"
    assert st.stop_token_ids() == [42]


def test_unpad_image_both_orientations():
    from videollamb_tpu.mm_utils import unpad_image

    t = np.arange(2 * 8 * 8, dtype=np.float32).reshape(2, 8, 8)
    # Wide original (16x8 image): vertical padding removed.
    out = unpad_image(t, (16, 8))
    assert out.shape == (2, 4, 8)
    # Tall original (8x16): horizontal padding removed.
    out = unpad_image(t, (8, 16))
    assert out.shape == (2, 8, 4)
